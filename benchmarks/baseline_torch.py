"""Measure the reference's CPU PyTorch Gatys loop (iters/sec at 512px).

The reference publishes no numbers (BASELINE.md), so the baseline is
measured: an architecturally identical VGG-19 feature extractor (this
environment has no torchvision, so the ``vgg19().features`` Sequential is
reconstructed layer-for-layer — random weights change nothing about the
compute cost) driving the exact reference closure loop: torch.optim.LBFGS,
content conv4_2 + style grams conv1_1..5_1 + TV + edge losses, clamp each
closure (multi_style_transfer/run_style_transfer.py:100-151).

Run: ``python benchmarks/baseline_torch.py [--iters N] [--size 512]``
Writes benchmarks/baseline_cpu.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import torch
import torch.nn as nn

VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
CONV_NAMES = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3", "conv3_4",
    "conv4_1", "conv4_2", "conv4_3", "conv4_4",
    "conv5_1", "conv5_2", "conv5_3", "conv5_4",
]


def build_vgg19_features() -> nn.Sequential:
    layers, cin = [], 3
    for v in VGG19_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            cin = v
    return nn.Sequential(*layers)


class FeatureExtractor(nn.Module):
    """Reference Vgg19 semantics: capture pre-ReLU conv outputs."""

    def __init__(self, wanted):
        super().__init__()
        self.features = build_vgg19_features().eval()
        self.wanted = set(wanted)
        conv_idx = -1
        self.capture = {}
        for i, layer in enumerate(self.features):
            if isinstance(layer, nn.Conv2d):
                conv_idx += 1
                name = CONV_NAMES[conv_idx]
                if name in self.wanted:
                    self.capture[i] = name
        self.last = max(self.capture)

    def forward(self, x):
        out = {}
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self.capture:
                out[self.capture[i]] = x
            if i == self.last:
                break
        return out


def gram(x):
    b, c, h, w = x.shape
    f = x.view(b, c, h * w)
    return torch.bmm(f, f.transpose(1, 2)) / (b * c * h * w)


def run(size=512, iters=20, num_threads=0):
    if num_threads:
        torch.set_num_threads(num_threads)
    torch.manual_seed(101)
    content_layers = ["conv4_2"]
    style_layers = ["conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"]
    model = FeatureExtractor(content_layers + style_layers)
    for p in model.parameters():
        p.requires_grad_(False)

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    content = torch.rand(1, 3, size, size)
    style = torch.rand(1, 3, size, size)

    def normalize(x):
        return (x - mean) / std

    def grad_imgs(g):
        dx = g[:, :, 1:-1, 2:] - g[:, :, 1:-1, :-2]
        dy = g[:, :, 2:, 1:-1] - g[:, :, :-2, 1:-1]
        return torch.cat((dx, dy), 1)

    with torch.no_grad():
        content_feats = model(normalize(content))
        style_feats = model(normalize(style))
        style_grams = {l: gram(style_feats[l]) for l in style_layers}
        target_grad = grad_imgs(normalize(content).mean(1, keepdim=True))

    optim_img = torch.nn.Parameter(content.clone())
    optimizer = torch.optim.LBFGS([optim_img])

    w_style, w_content, w_tv, w_edge = 5e5, 1.0, 2e1, 2e1
    count = [0]

    def closure():
        optimizer.zero_grad()
        with torch.no_grad():
            optim_img.clamp_(0, 1)
        normed = normalize(optim_img)
        feats = model(normed)
        c_loss = sum(
            torch.mean((feats[l] - content_feats[l]) ** 2) for l in content_layers
        ) / len(content_layers)
        s_loss = sum(
            torch.mean((gram(feats[l]) - style_grams[l]) ** 2) for l in style_layers
        ) / len(style_layers)
        tv = (
            torch.sum(torch.abs(normed[:, :, 1:] - normed[:, :, :-1]))
            + torch.sum(torch.abs(normed[:, :, :, 1:] - normed[:, :, :, :-1]))
        ) / (normed.shape[1] * normed.shape[2] * normed.shape[3])
        g = grad_imgs(optim_img.mean(1, keepdim=True))
        e_loss = 0.5 * (
            torch.mean((g[:, 0] - target_grad[:, 0]) ** 2)
            + torch.mean((g[:, 1] - target_grad[:, 1]) ** 2)
        )
        loss = w_content * c_loss + w_style * s_loss + w_tv * tv + w_edge * e_loss
        loss.backward()
        count[0] += 1
        return loss

    # warm-up closure (allocators, threading) outside the timed window
    closure()
    count[0] = 0
    t0 = time.perf_counter()
    while count[0] < iters:
        optimizer.step(closure)
    dt = time.perf_counter() - t0
    ips = count[0] / dt
    return {"size": size, "iters": count[0], "seconds": dt, "iters_per_sec": ips}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()
    result = run(args.size, args.iters)
    out = os.path.join(os.path.dirname(__file__), "baseline_cpu.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
