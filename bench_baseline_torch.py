"""Reference-math stage-1 training step in PyTorch, for the bench baseline.

Implements the HiD-VAE stage-1 forward/backward from the reference's published
formulas (modules/h_rqvae.py, modules/quantize.py, modules/loss.py) —
independently written, used only to time torch on this host as `bench.py`'s
vs_baseline denominator (the reference's own GPU numbers are not published;
BASELINE.md). Runs on CPU (the only torch device in this image).
"""

import time

import torch
import torch.nn.functional as F
from torch import nn


class TorchMLP(nn.Module):
    def __init__(self, dims, normalize=False):
        super().__init__()
        layers = []
        for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            layers.append(nn.Linear(a, b, bias=False))
            if i != len(dims) - 2:
                layers.append(nn.SiLU())
        self.net = nn.Sequential(*layers)
        self.normalize = normalize

    def forward(self, x):
        out = self.net(x)
        return F.normalize(out, dim=-1) if self.normalize else out


class TorchTagPredictor(nn.Module):
    def __init__(self, d, n_classes, hidden):
        super().__init__()
        self.gate = nn.Sequential(
            nn.Linear(d, d // 4), nn.ReLU(), nn.Linear(d // 4, d // 2),
            nn.GELU(), nn.Linear(d // 2, d), nn.Sigmoid(),
        )
        mid = int(hidden * 0.9)
        self.feat = nn.Sequential(nn.Linear(d, hidden), nn.LayerNorm(hidden), nn.ReLU())
        self.res1 = nn.Sequential(nn.Linear(hidden, mid), nn.LayerNorm(mid), nn.ReLU(),
                                  nn.Linear(mid, hidden), nn.ReLU(), nn.LayerNorm(hidden))
        self.res2 = nn.Sequential(nn.Linear(hidden, mid), nn.LayerNorm(mid), nn.ReLU(),
                                  nn.Linear(mid, hidden), nn.ReLU(), nn.LayerNorm(hidden))
        self.cls = nn.Sequential(nn.Linear(hidden, mid), nn.LayerNorm(mid), nn.ReLU(),
                                 nn.Linear(mid, mid // 2), nn.ReLU(),
                                 nn.Linear(mid // 2, n_classes))

    def forward(self, x):
        h = x * self.gate(x)
        h = self.feat(h)
        h = h + self.res1(h)
        h = h + self.res2(h)
        return self.cls(h)


class TorchHidVae(nn.Module):
    def __init__(self, input_dim=768, embed_dim=32, hidden=(512, 256, 128),
                 k=256, n_layers=3, tag_counts=(38, 168, 348), tag_dim=768):
        super().__init__()
        self.encoder = TorchMLP([input_dim, *hidden, embed_dim], normalize=True)
        self.decoder = TorchMLP([embed_dim, *hidden[::-1], input_dim], normalize=True)
        self.codebooks = nn.ParameterList(
            [nn.Parameter(torch.rand(k, embed_dim)) for _ in range(n_layers)]
        )
        self.projectors = nn.ModuleList([
            nn.Sequential(nn.Linear(tag_dim, hidden[0]), nn.BatchNorm1d(hidden[0]),
                          nn.ReLU(), nn.Linear(hidden[0], embed_dim * (i + 1)),
                          nn.LayerNorm(embed_dim * (i + 1)))
            for i in range(n_layers)
        ])
        self.predictors = nn.ModuleList([
            TorchTagPredictor(embed_dim * (i + 1), tag_counts[i],
                              hidden[0] // 2 * (i + 1))
            for i in range(n_layers)
        ])
        self.n_layers = n_layers

    def forward(self, x, tags_emb, tags_idx):
        res = self.encoder(x)
        encoded = res
        embs = []
        q_loss = 0.0
        align = 0.0
        pred = 0.0
        for i in range(self.n_layers):
            cb = F.normalize(self.codebooks[i], dim=-1) if i == 0 else self.codebooks[i]
            dist = (res ** 2).sum(-1, keepdim=True) + (cb ** 2).sum(-1) - 2 * res @ cb.T
            ids = dist.detach().argmin(-1)
            emb = cb[ids]
            emb_st = res + (emb - res).detach()
            q_loss = q_loss + ((res.detach() - emb) ** 2).sum(-1) + 0.4 * ((res - emb.detach()) ** 2).sum(-1)
            embs.append(emb_st)
            concat = torch.cat(embs, -1)
            proj = self.projectors[i](tags_emb[:, i])
            logits = F.normalize(concat, dim=-1) @ F.normalize(proj, dim=-1).T / 0.1
            align = align + F.cross_entropy(logits, torch.arange(len(x)))
            pred = pred + F.cross_entropy(self.predictors[i](concat), tags_idx[:, i])
            res = res - emb_st
        x_hat = self.decoder(sum(embs))
        recon = ((x_hat - x) ** 2).sum(-1)
        return recon.mean() + q_loss.mean() + 0.15 * align / 3 + 0.55 * pred / 3


def measure_torch_items_per_sec(batch_size=256, steps=10, warmup=2, seed=0):
    torch.manual_seed(seed)
    model = TorchHidVae()
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4)
    x = F.normalize(torch.randn(batch_size, 768), dim=-1)
    tags_emb = torch.randn(batch_size, 3, 768)
    tags_idx = torch.stack(
        [torch.randint(0, c, (batch_size,)) for c in (38, 168, 348)], -1
    )

    def step():
        opt.zero_grad()
        loss = model(x, tags_emb, tags_idx)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


if __name__ == "__main__":
    print(measure_torch_items_per_sec())
