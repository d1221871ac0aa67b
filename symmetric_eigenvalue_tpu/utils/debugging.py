"""Debug printers (ref helper.c:64-93)."""

from __future__ import annotations

import numpy as np


def print_vector(vec):
    vec = np.asarray(vec)
    print(", ".join(f"{v:g}" for v in vec))


def print_tridiagonal_matrix(d, e):
    d = np.asarray(d)
    e = np.asarray(e)
    n = d.shape[0]
    assert n > 0
    if n == 1:
        print(f"{d[0]:g}")
        return
    if n == 2:
        print(f"{d[0]:g}\t{e[0]:g}")
        print(f"{e[0]:g}\t{d[1]:g}")
        return
    print(f"0\t{d[0]:g}\t{e[0]:g}")
    for i in range(1, n - 1):
        print(f"{e[i-1]:g}\t{d[i]:g}\t{e[i]:g}")
    print(f"{e[n-2]:g}\t{d[n-1]:g}\t0")


def print_matrix(M):
    M = np.asarray(M)
    for row in M:
        print_vector(row)
