from .schemes import sampling_schemes
