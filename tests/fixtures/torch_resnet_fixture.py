"""Torchvision-style ResNet-152 fixtures for the CARLA regressor converter.

Independent torch re-implementation of torchvision's resnet152 layout (same
state-dict keys: conv1/bn1/layer{1..4}.{i}.conv{1..3}/bn{1..3}/downsample.{0,1}/fc)
plus the reference's multi-head regressor layout (``resnet.*`` prefix +
``regressors.{i}``, carla_regressor.py:163-184), with seeded random weights.
Residual-branch BN gammas are scaled down so 50 random blocks stay numerically
sane (a trained net relies on learned stats; a random one would blow up).
"""

import torch


class Bottleneck(torch.nn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride=stride,
                                     padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.relu = torch.nn.ReLU(inplace=True)
        if downsample:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                torch.nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = self.downsample(x) if hasattr(self, "downsample") else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


class ResNet152(torch.nn.Module):
    def __init__(self, num_classes=100):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU(inplace=True)
        self.maxpool = torch.nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for stage, n_blocks in enumerate((3, 8, 36, 3)):
            planes = 64 * (2 ** stage)
            blocks = []
            for b in range(n_blocks):
                stride = 2 if stage > 0 and b == 0 else 1
                blocks.append(Bottleneck(cin, planes, stride, downsample=(b == 0)))
                cin = planes * 4
            setattr(self, f"layer{stage + 1}", torch.nn.Sequential(*blocks))
        self.avgpool = torch.nn.AdaptiveAvgPool2d(1)
        self.fc = torch.nn.Linear(2048, num_classes)

    def trunk(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in (1, 2, 3, 4):
            x = getattr(self, f"layer{i}")(x)
        return torch.flatten(self.avgpool(x), 1)  # (B, 2048)

    def forward(self, x):
        return self.fc(self.trunk(x))


class MultiHeadRegressor(torch.nn.Module):
    """Reference layout: shared trunk under ``resnet.`` + 100 (x,y) heads."""

    def __init__(self):
        super().__init__()
        self.resnet = ResNet152()
        self.regressors = torch.nn.ModuleList(
            [torch.nn.Linear(2048, 2) for _ in range(100)])

    def forward(self, x, cells):
        emb = self.resnet.trunk(x)
        out = torch.stack([self.regressors[int(c)](e)
                           for e, c in zip(emb, cells)])
        return out


def randomize_(model, seed):
    """Seeded, numerically-sane random weights: BN stats randomized (so the
    conversion of running stats is exercised), residual bn3/downsample-bn
    gammas scaled to 0.2 to bound variance growth over 50 blocks."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, m in model.named_modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
                if name.endswith("bn3") or name.endswith("downsample.1"):
                    m.weight.mul_(0.2)
            elif isinstance(m, torch.nn.Linear):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.05)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
    return model
