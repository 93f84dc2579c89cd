"""Measured stand-in for the rlpyt serial Atari-DQN baseline
(VERDICT round-1 item #4: replace the hard-coded 2,000 steps/s estimate
with a documented, reproducible measurement).

The reference mount is empty and rlpyt/ALE are not installed, so this
reproduces the *serial-sampler DQN topology* rlpyt's examples/example_1
runs — one env stepped in Python, per-step Nature-CNN inference, one
batch-32 update every 4 env-steps (replay_ratio=8) with a target
network — in torch on this host's CPU, with a synthetic 104x80x4 uint8
frame source standing in for ALE (ALE's emulator step is ~microseconds;
the frame copy dominates either way).

This measures a FLOOR for the baseline (rlpyt trains on a GPU; its
serial sampler still steps envs one Python call at a time, which is the
structural bottleneck this repo's fused on-device path removes).
BASELINE.md records both this measured floor and the literature
~1-2k steps/s GPU estimate; bench.py's vs_baseline keeps the generous
2,000 constant so the headline ratio is understated, not inflated.

Prints ONE JSON line: {"metric", "value", "unit"}.
"""
from __future__ import annotations

import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

H, W, K, A = 104, 80, 4, 6


class NatureCnn(nn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(K, 32, 8, 4)
        self.c2 = nn.Conv2d(32, 64, 4, 2, 1)
        self.c3 = nn.Conv2d(64, 64, 3, 1, 1)
        with torch.no_grad():
            x = self.c3(self.c2(self.c1(torch.zeros(1, K, H, W))))
        self.fc = nn.Linear(int(np.prod(x.shape[1:])), 512)
        self.q = nn.Linear(512, A)

    def forward(self, x):
        x = x.float() / 255.0
        x = F.relu(self.c1(x))
        x = F.relu(self.c2(x))
        x = F.relu(self.c3(x))
        x = F.relu(self.fc(x.flatten(1)))
        return self.q(x)


def main():
    torch.set_num_threads(max(1, (torch.get_num_threads() or 2)))
    rng = np.random.RandomState(0)
    model = NatureCnn()
    target = NatureCnn()
    target.load_state_dict(model.state_dict())
    opt = torch.optim.Adam(model.parameters(), lr=2.5e-4)

    replay = np.zeros((10_000, K, H, W), np.uint8)
    rewards = np.zeros((10_000,), np.float32)
    actions = np.zeros((10_000,), np.int64)
    frame = rng.randint(0, 256, (K, H, W), np.uint8)

    def env_step():
        # synthetic ALE stand-in: roll the stack, new pseudo-frame
        nonlocal frame
        frame = np.concatenate(
            [frame[1:], ((frame[-1:] * 3 + 13) & 0xFF)], axis=0)
        return frame, float(rng.rand() < 0.01)

    def one_step(t):
        obs, rew = env_step()
        with torch.no_grad():
            q = model(torch.from_numpy(obs[None]))
        a = int(q.argmax()) if rng.rand() > 0.1 else rng.randint(A)
        i = t % len(replay)
        replay[i], rewards[i], actions[i] = obs, rew, a
        if t % 4 == 3 and t > 64:  # replay_ratio 8, batch 32
            idx = rng.randint(0, min(t, len(replay) - 1), 32)
            b = torch.from_numpy(replay[idx])
            b2 = torch.from_numpy(replay[(idx + 1) % len(replay)])
            qs = model(b).gather(
                1, torch.from_numpy(actions[idx])[:, None])[:, 0]
            with torch.no_grad():
                y = (torch.from_numpy(rewards[idx])
                     + 0.99 * target(b2).max(1).values)
            loss = F.smooth_l1_loss(qs, y)
            opt.zero_grad()
            loss.backward()
            opt.step()
        if t % 2500 == 0:
            target.load_state_dict(model.state_dict())

    for t in range(100):  # warmup
        one_step(t)
    n = 600
    t0 = time.perf_counter()
    for t in range(100, 100 + n):
        one_step(t)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "env-steps/s (rlpyt-topology serial Atari DQN stand-in,"
                  " torch CPU, Nature-CNN, replay_ratio=8)",
        "value": round(n / dt, 1),
        "unit": "env-steps/s",
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
