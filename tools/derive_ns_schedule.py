"""Derive a per-iteration optimal quintic Newton-Schulz coefficient schedule.

Greedy minimax construction (the "polar express" idea): maintaining the
current singular-value interval [l, u], each iteration picks the odd
quintic p(x) = a*x + b*x^3 + c*x^5 minimizing max_{x in [l,u]} |1 - p(x)|.
Since p is linear in (a, b, c), each step is a small linear program over a
dense grid. The composed schedule contracts [l0, 1] toward 1 far faster
than repeating one fixed polynomial: the classic Muon quintic
(3.4445, -4.7750, 2.0315) needs ~9 iterations to bring sigma=1e-3 into
[0.7, 1.3]; the greedy schedule does it in 5.

Also verifies, against exact polar factors from SVD, that the first K
schedule iterations reach a given orthogonality error vs classic-N.

Run on CPU (pure numpy/scipy — no chip needed):
    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/derive_ns_schedule.py
"""

import numpy as np
from scipy.optimize import linprog


def minimax_quintic(l, u, n_grid=4000, cap=None):
    """(a, b, c) minimizing max_{x in [l,u]} |1 - (a x + b x^3 + c x^5)|,
    subject to p(x) >= 0 on the interval (keeps singular values from
    crossing zero, which would flip singular vectors) and, when ``cap`` is
    given, p(x) <= cap on the slightly widened interval [l, 1.02*u] — the
    hard overshoot bound that keeps every intermediate iterate safely
    inside the quintic's convergence basin even when bf16 rounding nudges
    a singular value past the tracked interval edge."""
    # log-spaced grid resolves the steep region near l when l << u
    x = np.geomspace(max(l, 1e-12), u, n_grid)
    V = np.stack([x, x**3, x**5], axis=1)
    # variables: a, b, c, E ; minimize E
    #   1 - Vw <= E   ->  -Vw - E <= -1
    #   Vw - 1 <= E   ->   Vw - E <= 1
    #   -Vw <= 0      (nonnegativity)
    A_ub = np.concatenate(
        [
            np.concatenate([-V, -np.ones((n_grid, 1))], axis=1),
            np.concatenate([V, -np.ones((n_grid, 1))], axis=1),
            np.concatenate([-V, np.zeros((n_grid, 1))], axis=1),
        ]
    )
    b_ub = np.concatenate([-np.ones(n_grid), np.ones(n_grid), np.zeros(n_grid)])
    if cap is not None:
        xw = np.geomspace(max(l, 1e-12), 1.02 * u, n_grid)
        Vw = np.stack([xw, xw**3, xw**5], axis=1)
        A_ub = np.concatenate(
            [A_ub, np.concatenate([Vw, np.zeros((n_grid, 1))], axis=1)]
        )
        b_ub = np.concatenate([b_ub, np.full(n_grid, cap)])
    res = linprog(
        c=[0.0, 0.0, 0.0, 1.0],
        A_ub=A_ub,
        b_ub=b_ub,
        bounds=[(None, None)] * 3 + [(0, None)],
        method="highs",
    )
    assert res.success, res.message
    a, b, c, e = res.x
    return (a, b, c), e


def derive(l0=1e-3, iters=8, safety=1.01, cap=1.30):
    """Greedy schedule from [l0, 1]. ``safety`` divides each polynomial so
    its max stays strictly below the blow-up basin under bf16 rounding
    (the fixed point then sits at ~1/safety instead of 1, which Muon does
    not care about: the update is orthogonal up to a scalar). ``cap``
    hard-bounds every polynomial's max — without it the greedy schedule
    overshoots to ~1.97 between iterations, one bf16 ulp away from the
    basin edge (~2.0), and the composed matrix iteration diverges on
    spectra that fill the design interval (measured: err 242 at 6
    iterations on iid 256x1024)."""
    sched = []
    l, u = l0, 1.0
    for k in range(iters):
        (a, b, c), e = minimax_quintic(l, u, cap=cap)
        a, b, c = a / safety, b / safety, c / safety
        # exact new interval from the safetied polynomial on [l, u]
        xg = np.geomspace(l, u, 20000)
        p = a * xg + b * xg**3 + c * xg**5
        l, u = float(p.min()), float(p.max())
        sched.append((a, b, c))
        print(f"iter {k+1}: coeffs=({a:.10f}, {b:.10f}, {c:.10f}) "
              f"-> interval [{l:.6f}, {u:.6f}] (pre-safety minimax err {e:.6f})")
    return sched


def ns_apply(x, schedule):
    for a, b, c in schedule:
        if x.shape[-2] > x.shape[-1]:
            x = np.swapaxes(x, -2, -1)
            tr = True
        else:
            tr = False
        xxt = x @ np.swapaxes(x, -2, -1)
        x = a * x + (b * xxt + c * xxt @ xxt) @ x
        if tr:
            x = np.swapaxes(x, -2, -1)
    return x


def ortho_err_vs_exact(g, schedule):
    """max-singular-value deviation of O from the exact polar factor."""
    u, s, vt = np.linalg.svd(g, full_matrices=False)
    exact = u @ vt
    x = g / np.linalg.norm(g, "fro", axis=(-2, -1), keepdims=True)
    o = ns_apply(x, schedule)
    # singular values of O (should all be ~1)
    so = np.linalg.svd(o, compute_uv=False)
    return float(np.max(np.abs(so - 1.0))), float(
        np.linalg.norm(o - exact) / np.linalg.norm(exact)
    )


def main():
    print("== deriving greedy minimax schedule (l0=1e-3, bf16 safety 1.01) ==")
    sched = derive()
    print("\nPython tuple for optim/muon.py:")
    print("_PE_SCHEDULE = (")
    for a, b, c in sched:
        print(f"    ({a:.10f}, {b:.10f}, {c:.10f}),")
    print(")")

    classic = [(3.4445, -4.7750, 2.0315)] * 5
    rng = np.random.default_rng(0)
    print("\n== orthogonality error vs exact polar (max |sigma(O)-1|, relF) ==")
    for name, g in [
        ("iid  1280x1280", rng.standard_normal((1280, 1280))),
        ("iid  1280x5120", rng.standard_normal((1280, 5120))),
        (
            "momentum-like (decaying spectrum)",
            (rng.standard_normal((1280, 64)) * (0.95 ** np.arange(64)))
            @ rng.standard_normal((64, 1280))
            + 1e-3 * rng.standard_normal((1280, 1280)),
        ),
    ]:
        e5, _ = ortho_err_vs_exact(g, classic)
        for k in range(3, len(sched) + 1):
            ek, _ = ortho_err_vs_exact(g, sched[:k])
            print(f"{name}: classic5={e5:.4f}  pe{k}={ek:.4f}")


if __name__ == "__main__":
    main()
