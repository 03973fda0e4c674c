"""Fields-of-Experts image denoising.

TPU-native equivalent of /root/reference/examples/denoising.cc and
fields_of_experts.{h,cc}: per-pixel quadratic data terms + per-patch linear
filter residuals under the FoE loss alpha*log(1 + s/2). The per-patch
residual blocks all share one cost function per filter, so the compiled
program evaluates each filter as ONE vmapped kind over every patch — the
convolutional structure emerges from kind batching.
"""
from __future__ import annotations

import dataclasses
import pathlib
from typing import List

import jax.numpy as jnp
import numpy as np

from .. import AnalyticCostFunction, AutoDiffCostFunction, LossFunction, Problem

_TINY = float(np.finfo(np.float64).tiny)


@dataclasses.dataclass
class FieldsOfExperts:
    size: int
    x_delta: np.ndarray
    y_delta: np.ndarray
    alpha: np.ndarray  # (num_filters,)
    filters: np.ndarray  # (num_filters, size*size)

    @property
    def num_filters(self):
        return self.filters.shape[0]

    @property
    def num_variables(self):
        return self.size * self.size


def read_foe_file(path) -> FieldsOfExperts:
    vals = pathlib.Path(path).read_text().split()
    it = iter(vals)
    size = int(next(it))
    num_filters = int(next(it))
    nv = size * size
    x_delta = np.asarray([int(next(it)) for _ in range(nv)])
    y_delta = np.asarray([int(next(it)) for _ in range(nv)])
    alpha = np.asarray([float(next(it)) for _ in range(num_filters)])
    filters = np.asarray(
        [[float(next(it)) for _ in range(nv)] for _ in range(num_filters)]
    )
    return FieldsOfExperts(size, x_delta, y_delta, alpha, filters)


def read_pgm(path) -> np.ndarray:
    """Plain/raw PGM reader (examples/pgm_image.h)."""
    data = pathlib.Path(path).read_bytes()
    if data[:2] == b"P5":
        # header: magic, width, height, maxval then binary
        parts = []
        idx = 2
        while len(parts) < 3:
            # skip whitespace/comments
            while idx < len(data) and data[idx : idx + 1].isspace():
                idx += 1
            if data[idx : idx + 1] == b"#":
                while data[idx : idx + 1] != b"\n":
                    idx += 1
                continue
            start = idx
            while idx < len(data) and not data[idx : idx + 1].isspace():
                idx += 1
            parts.append(int(data[start:idx]))
        idx += 1  # single whitespace after maxval
        w, h, maxval = parts
        img = np.frombuffer(data[idx : idx + w * h], np.uint8).reshape(h, w)
        return img.astype(np.float64)
    if data[:2] == b"P2":
        lines = [
            ln for ln in data.decode().splitlines() if not ln.strip().startswith("#")
        ]
        toks = " ".join(lines).split()
        w, h = int(toks[1]), int(toks[2])
        vals = np.asarray([float(v) for v in toks[4 : 4 + w * h]])
        return vals.reshape(h, w)
    raise ValueError("not a PGM file")


def write_pgm(path, img: np.ndarray):
    img8 = np.clip(np.round(img), 0, 255).astype(np.uint8)
    h, w = img.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode())
        f.write(img8.tobytes())


class FoELoss(LossFunction):
    """rho(s) = alpha * log(1 + s/2) (fields_of_experts.cc:77-84)."""

    def __init__(self, alpha: float):
        self.alpha = alpha

    def evaluate(self, s):
        c = 0.5
        total = 1.0 + s * c
        inv = 1.0 / total
        rho0 = self.alpha * jnp.log(total)
        rho1 = jnp.maximum(_TINY, self.alpha * c * inv)
        rho2 = -self.alpha * c * c * inv * inv
        return rho0, rho1, rho2


def create_problem(foe: FieldsOfExperts, noisy: np.ndarray, sigma: float):
    """denoising.cc CreateProblem. Returns (problem, pixel_arrays (h,w) of
    1-element arrays)."""
    h, w = noisy.shape
    pixels = [[np.asarray([noisy[y, x]]) for x in range(w)] for y in range(h)]
    problem = Problem()
    coefficient = 1.0 / (2.0 * sigma * sigma)
    sqrt_a = np.sqrt(coefficient)

    quad = AutoDiffCostFunction(
        lambda px, b: sqrt_a * (px[0] - b), 1, [1], name="quad_data"
    )
    for y in range(h):
        for x in range(w):
            problem.add_residual_block(
                quad, None, [pixels[y][x]], data=np.float64(noisy[y, x])
            )

    # One cost function + loss per filter: each becomes one vmapped kind.
    filter_costs = []
    for fi in range(foe.num_filters):
        coeffs = jnp.asarray(foe.filters[fi])

        def make(coeffs):
            def f(*px):
                vals = jnp.stack([p[0] for p in px])
                return jnp.sum(coeffs * vals)

            return f

        filter_costs.append(
            (
                AutoDiffCostFunction(
                    make(coeffs), 1, [1] * foe.num_variables, name=f"foe{fi}"
                ),
                FoELoss(foe.alpha[fi]),
            )
        )
    for x in range(w - foe.size + 1):
        for y in range(h - foe.size + 1):
            patch = [
                pixels[y + foe.y_delta[i]][x + foe.x_delta[i]]
                for i in range(foe.num_variables)
            ]
            for cost, loss in filter_costs:
                problem.add_residual_block(cost, loss, patch)
    return problem, pixels


def pixels_to_image(pixels) -> np.ndarray:
    return np.asarray([[p[0] for p in row] for row in pixels])
