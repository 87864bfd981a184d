"""Torch AlexNet-LPIPS fixture exposing the ``lpips.LPIPS`` interface.

An independent re-implementation of the lpips pip package's forward
(ScalingLayer shift/scale -> torchvision-AlexNet feature taps ->
channel-unit-normalize (eps 1e-10 outside the sqrt) -> squared diff ->
1x1 nonneg head conv -> spatial mean -> sum over stages) with seeded
random weights at the REAL AlexNet widths, so scripts/convert_lpips.py's
main() executes verbatim and its validation assert is meaningful.
"""

import torch


class NetLinLayer(torch.nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.model = torch.nn.Sequential(
            torch.nn.Dropout(), torch.nn.Conv2d(channels, 1, 1, bias=False)
        )


class AlexFeatures(torch.nn.Module):
    """torchvision alexnet ``features`` clone returning the 5 relu taps."""

    def __init__(self):
        super().__init__()
        self.features = torch.nn.Sequential(
            torch.nn.Conv2d(3, 64, 11, stride=4, padding=2), torch.nn.ReLU(),
            torch.nn.MaxPool2d(3, 2),
            torch.nn.Conv2d(64, 192, 5, padding=2), torch.nn.ReLU(),
            torch.nn.MaxPool2d(3, 2),
            torch.nn.Conv2d(192, 384, 3, padding=1), torch.nn.ReLU(),
            torch.nn.Conv2d(384, 256, 3, padding=1), torch.nn.ReLU(),
            torch.nn.Conv2d(256, 256, 3, padding=1), torch.nn.ReLU(),
        )

    def forward(self, x):
        taps = []
        for m in self.features:
            x = m(x)
            if isinstance(m, torch.nn.ReLU):
                taps.append(x)
        return taps


class LPIPS(torch.nn.Module):
    """Drop-in for lpips.LPIPS(net="alex", spatial=False), random weights."""

    def __init__(self, net="alex", spatial=False, seed=0):
        assert net == "alex" and not spatial
        super().__init__()
        torch.manual_seed(seed)
        self.net = AlexFeatures()
        self.lins = torch.nn.ModuleList(
            [NetLinLayer(c) for c in (64, 192, 384, 256, 256)]
        )
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))
        with torch.no_grad():
            for lin in self.lins:
                w = lin.model[-1].weight
                w.copy_(torch.rand(w.shape))  # nonneg, like the trained head

    @staticmethod
    def _normalize(feat):
        norm = torch.sqrt((feat ** 2).sum(dim=1, keepdim=True))
        return feat / (norm + 1e-10)

    def forward(self, x, y):
        fx = self.net((x - self.shift) / self.scale)
        fy = self.net((y - self.shift) / self.scale)
        out = 0
        for lin, a, b in zip(self.lins, fx, fy):
            d = (self._normalize(a) - self._normalize(b)) ** 2
            out = out + lin.model[-1](d).mean(dim=(2, 3), keepdim=True)
        return out
