"""Torch test oracle for GRUResNet parity.

A compact torch implementation of the reference network's math
(reference: dmpfold/network.py:181-314), built from torch library modules so
that (a) its ``state_dict()`` uses the exact reference parameter names —
exercising our checkpoint converter on realistically-shaped random weights —
and (b) its eval-mode forward serves as a numerical oracle for our JAX
forward. Test-only code; never shipped.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class _Maxout(nn.Module):
    def __init__(self, cin, cout, pool, k=1):
        super().__init__()
        self.pool = pool
        self.lin = nn.Conv2d(cin, cout * pool, kernel_size=k, padding=(k - 1) // 2)
        self.norm = nn.InstanceNorm2d(cout, affine=True)

    def forward(self, x):
        y = self.lin(x)
        n, c, h, w = y.shape
        y = y.view(n, c // self.pool, self.pool, h, w).max(dim=2)[0]
        return self.norm(y)


class _CSE(nn.Module):
    def __init__(self, width, red=16):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(width, width // red, bias=False),
            nn.ReLU(),
            nn.Linear(width // red, width, bias=False),
            nn.Sigmoid(),
        )

    def forward(self, x):
        y = self.fc(x.mean(dim=(2, 3)))
        return x * y[:, :, None, None]


class _SSE(nn.Module):
    def __init__(self, width):
        super().__init__()
        self.conv = nn.Conv2d(width, 1, kernel_size=1)

    def forward(self, x):
        return x * torch.sigmoid(self.conv(x))


class _SCSE(nn.Module):
    def __init__(self, width, red):
        super().__init__()
        self.cSE = _CSE(width, red)
        self.sSE = _SSE(width)

    def forward(self, x):
        return self.cSE(x) + self.sSE(x)


class _Block(nn.Module):
    def __init__(self, width, k):
        super().__init__()
        self.layer1 = _Maxout(width, width, 4, k)
        self.scSE = _SCSE(width, 16)

    def forward(self, x):
        return x + self.scSE(self.layer1(x))


class OracleGRUResNet(nn.Module):
    """Eval-mode oracle; state_dict keys match the reference checkpoint."""

    def __init__(self, width=512, cwidth=128, nblocks=16):
        super().__init__()
        self.embed = nn.Embedding.from_pretrained(torch.eye(22), freeze=True)
        self.vgru = nn.GRU(22, width, num_layers=2)
        self.hgru = nn.GRU(width, width // 2, num_layers=2, dropout=0.1, bidirectional=True)
        mods = [_Maxout(442 + width + 1, cwidth, 3)]
        mods += [_Block(cwidth, 5) for _ in range(nblocks)]
        mods += [nn.Conv2d(cwidth, 2, kernel_size=1)]
        self.resnet = nn.Sequential(*mods)
        self.coord_gru = nn.GRU(width + 8, width // 2, batch_first=True,
                                num_layers=3, dropout=0.1, bidirectional=True)
        self.coord_fc = nn.Linear(width, 3, bias=False)

    def _heads(self, resinp):
        y = self.resnet(resinp)
        dm, conf = y[:, 0], y[:, 1].mean(dim=2)
        dm = torch.abs(0.5 * (dm + dm.transpose(1, 2)))
        gram = 0.5 * (dm[:, :1, :] ** 2 + dm[:, :, :1] ** 2 - dm ** 2)
        w, v = torch.linalg.eigh(gram.float())
        w = torch.clamp(F.relu(w), min=1e-8)
        mds = (v * w.sqrt()[:, None, :])[:, :, -8:]
        # match our deterministic eigenvector sign canonicalization
        v8 = v[:, :, -8:]
        comp = torch.gather(v8, 1, v8.abs().argmax(dim=1, keepdim=True))[:, 0]
        mds = mds * torch.where(comp < 0, -1.0, 1.0)[:, None, :]
        return dm, conf, mds

    def _coords(self, mat1d, mds):
        emb = torch.cat((mat1d.permute(0, 2, 1), mds), dim=2)
        return self.coord_fc(self.coord_gru(emb)[0])

    @torch.no_grad()
    def forward(self, aln, x2, nloops, refine_fn=None):
        nres = aln.shape[1]
        e = self.embed(aln)
        v = self.vgru(e)[0][-1]                    # (L, width)
        h = self.hgru(v.unsqueeze(1))[0]           # (L, 1, width)
        mat1d = h.permute(1, 2, 0)                 # (1, width, L)
        pair = mat1d.unsqueeze(2) * mat1d.unsqueeze(3)
        resinp = torch.cat((pair, x2), dim=1)

        dm, conf, mds = self._heads(resinp)
        ca = self._coords(mat1d, mds)
        if refine_fn is not None:
            ca = refine_fn(ca.squeeze(0)).unsqueeze(0)
        best_conf, best_ca = conf, ca

        for _ in range(nloops):
            dmap = torch.clamp((ca - ca.transpose(0, 1)).pow(2).sum(dim=2), min=1e-8).sqrt()
            resinp = torch.cat((resinp[:, :-1], dmap[None, None]), dim=1)
            dm, conf, mds = self._heads(resinp)
            ca = self._coords(mat1d, mds)
            if conf.mean() > best_conf.mean():
                best_conf, best_ca = conf, ca

        if refine_fn is not None:
            best_ca = refine_fn(best_ca.squeeze(0)).unsqueeze(0)
        return best_ca, torch.sigmoid(best_conf)


def oracle_refine(coords, n_steps):
    """Reference force-field refinement (network.py:106-137) as a torch oracle."""
    for _ in range(n_steps):
        n = coords.shape[0]
        rep = coords.unsqueeze(0).expand(n, -1, -1)
        diffs = rep - rep.transpose(0, 1)
        dists = diffs.norm(dim=2).clamp(min=0.01, max=10.0)
        viol = (dists < 3.0).float() * (3.0 - dists)
        acc = (100.0 * viol.unsqueeze(2) * diffs / dists.unsqueeze(2)).sum(dim=0)
        ad = coords[1:] - coords[:-1]
        adist = ad.norm(dim=1).clamp(min=0.1)
        aviol = (adist - 3.78).clamp(max=3.0)
        acov = 100.0 * aviol.unsqueeze(1) * ad / adist.unsqueeze(1)
        acc[:-1] += acov
        acc[1:] -= acov
        coords = coords + acc.clamp(min=-100.0, max=100.0) * 0.001
    return coords


def oracle_main_chain(ca):
    """Reference backbone completion (network.py:141-177) as a torch oracle."""
    v21 = ca[:, :1] - ca[:, 1:2]
    v23 = ca[:, 2:3] - ca[:, 1:2]
    vc1 = ca[:, -1:] - ca[:, -2:-1]
    vc3 = ca[:, -3:-2] - ca[:, -2:-1]
    nterm = ca[:, :1] + 3.82 * F.normalize(torch.cross(v21, v23, dim=2), dim=2)
    cterm = ca[:, -1:] + 3.82 * F.normalize(torch.cross(vc1, vc3, dim=2), dim=2)
    ext = torch.cat((nterm, ca, cterm), dim=1)
    vcan = ext[:, :-2] - ext[:, 1:-1]
    vcac = ext[:, 2:] - ext[:, 1:-1]
    mid = (ext[:, 1:] + ext[:, :-1]) / 2
    cr = F.normalize(torch.cross(vcan, vcac, dim=2), dim=2)
    n_at = mid[:, :-1] - vcan / 8 + cr / 4
    c_shift = mid[:, :-1] + vcan / 8 - cr / 2
    o_shift = mid[:, :-1] - cr * 1.8
    c_end = mid[:, -1:] - vcac[:, -1:] / 8 + cr[:, -1:] / 2
    o_end = mid[:, -1:] + cr[:, -1:] * 2.0
    c_at = torch.cat((c_shift[:, 1:], c_end), dim=1)
    o_at = torch.cat((o_shift[:, 1:], o_end), dim=1)
    vn = ca - n_at
    vc = ca - c_at
    crnc = torch.cross(vn, vc, dim=2)
    vcb = vn + vc
    import math
    ang = math.pi / 2 - math.asin(1 / math.sqrt(3))
    sx = (1.5 * math.cos(ang) / vcb.norm(dim=2)).unsqueeze(2)
    sy = (1.5 * math.sin(ang) / crnc.norm(dim=2)).unsqueeze(2)
    cb = ca + sx * vcb + sy * crnc
    out = torch.cat([t.unsqueeze(2) for t in (n_at, ca, c_at, o_at, cb)], dim=2)
    return out
