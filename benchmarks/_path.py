"""Put the repo root on sys.path so benchmark scripts run from any cwd."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
