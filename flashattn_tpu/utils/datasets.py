"""Toy 2-D classification datasets (reference ``minitorch/datasets.py`` parity:
simple/diag/split/xor/circle/spiral, :88-95)."""

from __future__ import annotations

import math
import random
from dataclasses import dataclass
from typing import List, Tuple


def make_pts(N: int, seed: int = 0) -> List[Tuple[float, float]]:
    rng = random.Random(seed)
    return [(rng.random(), rng.random()) for _ in range(N)]


@dataclass
class Graph:
    N: int
    X: List[Tuple[float, float]]
    y: List[int]


def simple(N: int, seed: int = 0) -> Graph:
    X = make_pts(N, seed)
    y = [1 if x_1 < 0.5 else 0 for x_1, _ in X]
    return Graph(N, X, y)


def diag(N: int, seed: int = 0) -> Graph:
    X = make_pts(N, seed)
    y = [1 if x_1 + x_2 < 0.5 else 0 for x_1, x_2 in X]
    return Graph(N, X, y)


def split(N: int, seed: int = 0) -> Graph:
    X = make_pts(N, seed)
    y = [1 if x_1 < 0.2 or x_1 > 0.8 else 0 for x_1, _ in X]
    return Graph(N, X, y)


def xor(N: int, seed: int = 0) -> Graph:
    X = make_pts(N, seed)
    y = [1 if ((x_1 < 0.5 and x_2 > 0.5) or (x_1 > 0.5 and x_2 < 0.5)) else 0
         for x_1, x_2 in X]
    return Graph(N, X, y)


def circle(N: int, seed: int = 0) -> Graph:
    X = make_pts(N, seed)
    y = [1 if (x_1 - 0.5) ** 2 + (x_2 - 0.5) ** 2 > 0.1 else 0
         for x_1, x_2 in X]
    return Graph(N, X, y)


def spiral(N: int, seed: int = 0) -> Graph:
    def x(t: float) -> float:
        return t * math.cos(t) / 20.0

    def y(t: float) -> float:
        return t * math.sin(t) / 20.0

    X = [(x(10.0 * (float(i) / (N // 2))) + 0.5,
          y(10.0 * (float(i) / (N // 2))) + 0.5) for i in range(5 + 0, 5 + N // 2)]
    X = X + [(y(-10.0 * (float(i) / (N // 2))) + 0.5,
              x(-10.0 * (float(i) / (N // 2))) + 0.5)
             for i in range(5 + 0, 5 + N // 2)]
    y2 = [0] * (N // 2) + [1] * (N // 2)
    return Graph(N, X, y2)


datasets = {
    "Simple": simple,
    "Diag": diag,
    "Split": split,
    "Xor": xor,
    "Circle": circle,
    "Spiral": spiral,
}
