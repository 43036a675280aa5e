"""Torch oracle of the reference architectures (test-only).

Independent, table-driven torch reimplementation of the reference
networks' exact semantics and state-dict naming, used to prove
full-model logit parity of the flax models after weight import
(SURVEY.md §7.2).  Semantics sources (cited, not copied):

  * ConvX residual block: ``/root/reference/models/fpn/components.py:80-227``
  * stage / projection / decoder tables: ``unets3D.py:37-185,356-437``
  * 2-input & 3-input up blocks: ``components.py:23-76``,
    ``fusion3D2D.py:897-1039``
  * index-gather nearest upsample: ``components.py:259-268``
  * hybrid + Level5 wiring: ``fusion3D2D.py:10-581``
  * 2D-only nets: ``unets2D.py:9-213``
  * wrapper nets (FPN*, late fusion): ``fusion_nets.py:29-216``
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

# (kernel, stride, padding) conv specs, 3D and 2D
B3 = ((1, 3, 3), (1, 1, 1), (0, 1, 1))   # in-B-scan 3x3
Z3 = ((3, 1, 1), (1, 1, 1), (1, 0, 0))   # cross-B-scan 3
P3 = ((1, 1, 3), (1, 1, 2), (0, 0, 1))   # depth-halving projection conv
D3 = ((3, 3, 1), (1, 1, 1), (1, 1, 0))   # decoder en-face 3x3
B2 = ((1, 3), (1, 1), (0, 1))
Z2 = ((3, 1), (1, 1), (1, 0))

_CONV = {2: tnn.Conv2d, 3: tnn.Conv3d}
_BN = {2: tnn.BatchNorm2d, 3: tnn.BatchNorm3d}


class ConvX(tnn.Module):
    """Residual conv block: [conv-BN-ReLU]*(n-1) + conv-BN, optional
    1x1(+BN) downsample path, add, final ReLU."""

    def __init__(self, rank, cin, cout, specs, residual=True, ds=False,
                 ds_stride=1):
        super().__init__()
        seqs = []
        for i, (k, s, p) in enumerate(specs):
            mods = [_CONV[rank](cin if i == 0 else cout, cout, k, s, p,
                                bias=False), _BN[rank](cout)]
            if i < len(specs) - 1:
                mods.append(tnn.ReLU())
            seqs.append(tnn.Sequential(*mods))
        self.convBlock = tnn.Sequential(*seqs)
        self.residual = residual
        if ds:
            self.downsample = tnn.Sequential(
                _CONV[rank](cin, cout, 1, stride=ds_stride, bias=False),
                _BN[rank](cout))
        else:
            self.downsample = None
        self.relu = tnn.ReLU()

    def forward(self, x):
        out = self.convBlock(x)
        res = self.downsample(x) if self.downsample is not None else x
        if self.residual:
            out = out + res
        return self.relu(out)


def stage(rank, cin, cout):
    """Encoder stage: 2-conv block + 3-conv (with cross-B-scan) block."""
    b, z = (B3, Z3) if rank == 3 else (B2, Z2)
    return tnn.Sequential(
        ConvX(rank, cin, cout, [b, b], ds=(cin != cout)),
        ConvX(rank, cout, cout, [b, b, z]))


def zdimred(c, num_reductions, final_kernel=4):
    """Projection head: num stride-2 (1,1,3) convs (residual via a
    strided 1x1 path) then a VALID (1,1,final) conv, no residual."""
    fully = ConvX(3, c, c, [((1, 1, final_kernel), (1, 1, 1), (0, 0, 0))],
                  residual=False)
    if num_reductions == 0:
        return tnn.Sequential(fully)
    red = ConvX(3, c, c, [P3] * num_reductions, ds=True,
                ds_stride=(1, 1, 2 ** num_reductions))
    return tnn.Sequential(red, fully)


def nearest_up(x, factors):
    """Deterministic index-gather nearest upsample (the reference's
    ceil-index formula, NOT F.interpolate)."""
    for d, f in zip((2, 3, 4), factors):
        n = int(x.shape[d] * f)
        idx = (np.ceil(np.arange(1, n + 1) / f) - 1).astype(int)
        x = x.index_select(d, torch.as_tensor(idx))
    return x


class UpBlock(tnn.Module):
    """Decoder block: nearest-upsample deeper, concat with skip(s)
    (optionally adding the two encoder skips first), ConvX (3,3,1)x2."""

    def __init__(self, c_low, c_cur, upfactor, n_skips=1, mode="concat"):
        super().__init__()
        self.upfactor = upfactor
        self.mode = mode
        self.n_skips = n_skips
        extra = c_cur * (2 if (n_skips == 2 and mode == "concat") else 1)
        self.conv = ConvX(3, c_low + extra, c_cur, [D3, D3], ds=True)

    def forward(self, *args):
        *skips, deeper = args
        up = nearest_up(deeper, self.upfactor)
        if self.n_skips == 2 and self.mode == "add":
            skips = [skips[0] + skips[1]]
        return self.conv(torch.cat(list(skips) + [up], dim=1))


POOLS_3D = ((1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2))
POOLS_2D = ((1, 2), (1, 2), (2, 2), (2, 2))
NUM_RED = (4, 3, 2, 1, 0)
UPFACTORS = ((2, 2, 1), (2, 2, 1), (1, 2, 1), (1, 2, 1))


class TUnet3D(tnn.Module):
    """Reference ModifiedUnet3D (projective 3D U-Net)."""

    def __init__(self, ch=(16, 32, 64, 128, 256), n_classes=1,
                 use_1x1=True):
        super().__init__()
        self.use_1x1 = use_1x1
        cins = (1,) + tuple(ch[:4])
        for i in range(5):
            setattr(self, f"conv{i + 1}", stage(3, cins[i], ch[i]))
            setattr(self, f"zdimRed{i + 1}", zdimred(ch[i], NUM_RED[i]))
        for i, lvl in enumerate((3, 2, 1, 0)):
            setattr(self, f"up_concat{lvl + 1}",
                    UpBlock(ch[lvl + 1], ch[lvl], UPFACTORS[i]))
        # final1 is ALWAYS registered, even when use_1x1=False — the
        # reference toggles the flag after init (fusion_nets.py:168-171),
        # leaving orphan parameters in late-fusion checkpoints.
        self.final1 = tnn.Conv3d(ch[0], n_classes, 1)

    def forward(self, x):
        skips = []
        for i in range(5):
            x = getattr(self, f"conv{i + 1}")(x)
            skips.append(x)
            if i < 4:
                x = F.max_pool3d(x, POOLS_3D[i])
        proj = [getattr(self, f"zdimRed{i + 1}")(skips[i]).mean(
            dim=4, keepdim=True) for i in range(5)]
        up = proj[4]
        for i, lvl in enumerate((3, 2, 1, 0)):
            up = getattr(self, f"up_concat{lvl + 1}")(proj[lvl], up)
        return self.final1(up) if self.use_1x1 else up


def _align(x2d, target, mode):
    if mode == "2d":
        return F.interpolate(x2d, size=target, mode="trilinear")
    if mode == "2d_max":
        return F.adaptive_max_pool3d(x2d, output_size=target)
    return x2d


class THybridL5(tnn.Module):
    """Reference ModifiedUnet3D2DLevel5 (hybrid fusion, 5-level)."""

    def __init__(self, ch=(16, 32, 64, 128, 256), n_classes=1,
                 interpolate=None, feature_fusion="concat"):
        super().__init__()
        self.interpolate = interpolate
        cins = (1,) + tuple(ch[:4])
        for i in range(5):
            setattr(self, f"conv{i + 1}", stage(3, cins[i], ch[i]))
            setattr(self, f"conv{i + 1}_2d", stage(2, cins[i], ch[i]))
            setattr(self, f"zdimRed{i + 1}", zdimred(ch[i], NUM_RED[i]))
        lows = (ch[4] * 2, ch[3], ch[2], ch[1])  # Level5 bottleneck concat
        for i, lvl in enumerate((3, 2, 1, 0)):
            setattr(self, f"up_concat{lvl + 1}",
                    UpBlock(lows[i], ch[lvl], UPFACTORS[i], n_skips=2,
                            mode=feature_fusion))
        self.final1 = tnn.Conv3d(ch[0], n_classes, 1)

    def forward(self, oct, slo):
        s2 = []
        x = slo
        for i in range(5):
            x = getattr(self, f"conv{i + 1}_2d")(x)
            s2.append(x)
            if i < 4:
                x = F.max_pool2d(x, POOLS_2D[i])
        s3 = []
        x = oct
        for i in range(5):
            x = getattr(self, f"conv{i + 1}")(x)
            s3.append(x)
            if i < 4:
                x = F.max_pool3d(x, POOLS_3D[i])
        proj = [getattr(self, f"zdimRed{i + 1}")(s3[i]).mean(
            dim=4, keepdim=True) for i in range(5)]
        lifted = [_align(s[:, :, :, :, None], p.shape[2:], self.interpolate)
                  for s, p in zip(s2, proj)]
        up = torch.cat([proj[4], lifted[4]], dim=1)
        for i, lvl in enumerate((3, 2, 1, 0)):
            up = getattr(self, f"up_concat{lvl + 1}")(
                proj[lvl], lifted[lvl], up)
        return self.final1(up)


class TUnet2DL5(tnn.Module):
    """Reference ModifiedUnet2DLevel5 (2D-only, 5 levels, 5D decoder)."""

    def __init__(self, ch=(16, 32, 64, 128, 256), n_classes=1,
                 output_features=False):
        super().__init__()
        self.output_features = output_features
        cins = (1,) + tuple(ch[:4])
        for i in range(5):
            setattr(self, f"conv{i + 1}_2d", stage(2, cins[i], ch[i]))
        for i, lvl in enumerate((3, 2, 1, 0)):
            setattr(self, f"up_concat{lvl + 1}",
                    UpBlock(ch[lvl + 1], ch[lvl], UPFACTORS[i]))
        if not output_features:
            # the reference wraps this one in a Sequential
            # (unets2D.py:104-108)
            self.final1 = tnn.Sequential(tnn.Conv3d(ch[0], n_classes, 1))

    def forward(self, x):
        skips = []
        for i in range(5):
            x = getattr(self, f"conv{i + 1}_2d")(x)
            skips.append(x)
            if i < 4:
                x = F.max_pool2d(x, POOLS_2D[i])
        lifted = [s[:, :, :, :, None] for s in skips]
        up = lifted[4]
        for i, lvl in enumerate((3, 2, 1, 0)):
            up = getattr(self, f"up_concat{lvl + 1}")(lifted[lvl], up)
        return up if self.output_features else self.final1(up)


# ---------------------------------------------------------------------------
# Wrapper nets (the factory classes of fusion_nets.py)

class TFPN(tnn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.resensnet = TUnet3D(**kw)

    def forward(self, batch):
        oct = batch["image"].permute(0, 1, 2, 4, 3)
        seg = self.resensnet(oct).permute(0, 1, 2, 4, 3)
        return {"prediction": torch.sigmoid(seg)}


class TFPNHybrid(tnn.Module):
    def __init__(self, fusion_modality="slo", **kw):
        super().__init__()
        self.fusion_modality = fusion_modality
        self.resensnet = THybridL5(**kw)

    def forward(self, batch):
        oct = batch["image"].permute(0, 1, 2, 4, 3)
        slo = batch[self.fusion_modality][:, :, :, 0, :]
        seg = self.resensnet(oct, slo).permute(0, 1, 2, 4, 3)
        return {"prediction": torch.sigmoid(seg)}


class TFPN2D(tnn.Module):
    def __init__(self, fusion_modality="slo", **kw):
        super().__init__()
        self.fusion_modality = fusion_modality
        self.resensnet = TUnet2DL5(**kw)

    def forward(self, batch):
        fused = batch[self.fusion_modality][:, :, :, 0, :]
        seg = self.resensnet(fused).permute(0, 1, 2, 4, 3)
        seg = torch.sigmoid(seg)
        if seg.shape != batch["mask"].shape:
            seg = F.interpolate(seg, size=batch["mask"].shape[2:],
                                mode="trilinear")
        return {"prediction": seg}


class TFPNLateFusion(tnn.Module):
    def __init__(self, ch=(16, 32, 64, 128, 256), n_classes=1,
                 fusion_modality="slo", interpolate=None):
        super().__init__()
        self.fusion_modality = fusion_modality
        self.interpolate = interpolate
        # use_1x1=False AFTER init: final1 params exist but are unused
        self.resensnet3d = TUnet3D(ch, n_classes, use_1x1=False)
        self.resensnet2d = TUnet2DL5(ch, n_classes, output_features=True)
        self.fusion_module = tnn.Conv3d(2 * ch[0], n_classes, (1, 1, 1))

    def forward(self, batch):
        oct = batch["image"].permute(0, 1, 2, 4, 3)
        oct_seg = self.resensnet3d(oct).permute(0, 1, 2, 4, 3)
        fused = batch[self.fusion_modality][:, :, :, 0, :]
        fused_seg = self.resensnet2d(fused).permute(0, 1, 2, 4, 3)
        fused_seg = _align(fused_seg, oct_seg.shape[2:], self.interpolate)
        seg = self.fusion_module(torch.cat([oct_seg, fused_seg], dim=1))
        return {"prediction": torch.sigmoid(seg)}


def randomize(model: tnn.Module, seed=0) -> tnn.Module:
    """Non-trivial BN running stats + affine params (torch's default
    conv init is already random)."""
    torch.manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.normal_(1, 0.1)
            m.bias.data.normal_(0, 0.1)
    return model.eval()
