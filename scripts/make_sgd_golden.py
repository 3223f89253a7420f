"""Golden fixture for torch.optim.SGD semantics (torch-only process).

The reference trains with SGD(lr, momentum=0.9, dampening=0.9,
weight_decay=1e-4) (train_AffNet_test_on_graffity.py:354-358).  torch
initializes the momentum buffer with the *undamped* gradient on first use,
so the first step differs 10x from the damped recurrence — this fixture
records 3 optimizer steps on a deterministic problem so affnet_tpu's
sgd_update can be tested against the real thing rather than a
self-referential formula.

Run:  python scripts/make_sgd_golden.py
"""

import os

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "..", "tests", "fixtures")

LR, MOM, DAMP, WD = 0.1, 0.9, 0.9, 0.1
N_STEPS = 3


def main():
    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    target = rng.randn(4, 3).astype(np.float32)

    w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([w], lr=LR, momentum=MOM, dampening=DAMP,
                          weight_decay=WD)
    snaps, bufs = [], []
    for _ in range(N_STEPS):
        opt.zero_grad()
        loss = ((w - torch.from_numpy(target)) ** 2).sum()
        loss.backward()
        opt.step()
        snaps.append(w.detach().numpy().copy())
        bufs.append(opt.state[w]["momentum_buffer"].numpy().copy())

    np.savez(os.path.join(FIX, "sgd_golden.npz"),
             w0=w0, target=target, lr=LR, momentum=MOM, dampening=DAMP,
             wd=WD,
             params=np.stack(snaps), momentum_buffers=np.stack(bufs))
    print("sgd_golden:", np.stack(snaps).shape)


if __name__ == "__main__":
    main()
