"""Host-loop L-BFGS for the embed solver (torch-exact update rule).

Closes the last hole in the optimizer registry
(reference: src/AWARE/embedding/optimizers.py:3-20 lists ``lbfgs``).

A fidelity note that shapes this design: the reference's embed loop calls
``optimizer.step()`` with **no closure** (multibit_embedder.py:112), but
``torch.optim.LBFGS.step(closure)`` requires one — selecting ``lbfgs`` in
the reference raises ``TypeError`` on the first iteration.  There is
therefore no reference *trajectory* to match, only torch's LBFGS update
rule itself.  We define the semantics as the natural repair: each solver
iteration performs exactly one quasi-Newton iteration, i.e. the trajectory
of ``torch.optim.LBFGS([coeffs], lr=lr, max_iter=1, history_size=100)``
driven with a closure once per iteration, with the solver's box clamp and
best-tracking applied between steps exactly as for every other optimizer.
That torch program is runnable, and tests/test_optim.py checks our
trajectory against it step-for-step.

L-BFGS needs a growing curvature history and (in torch's formulation)
data-dependent early exits, so it does not map to a fixed-shape
``lax.scan``; this is a host-driven loop around a jitted value-and-grad of
the embed objective — slower per clip than the scan solver (one device
dispatch per iteration) but honest and complete.  The two-loop recursion
itself is O(2·m·n) dot products on host numpy — negligible next to the
objective evaluation.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# torch.optim.LBFGS defaults (torch/optim/lbfgs.py)
TOLERANCE_GRAD = 1e-7
TOLERANCE_CHANGE = 1e-9
HISTORY_SIZE = 100


@dataclasses.dataclass
class LBFGSMemory:
    """Mutable curvature history; mirrors torch's per-param-group state."""

    history_size: int = HISTORY_SIZE
    n_iter: int = 0
    old_dirs: list = dataclasses.field(default_factory=list)  # y_k
    old_stps: list = dataclasses.field(default_factory=list)  # s_k
    ro: list = dataclasses.field(default_factory=list)        # 1/(y_k.s_k)
    h_diag: float = 1.0
    prev_flat_grad: np.ndarray | None = None
    d: np.ndarray | None = None
    t: float = 0.0


def lbfgs_update(
    mem: LBFGSMemory,
    params: np.ndarray,
    grad: np.ndarray,
    lr: float,
) -> np.ndarray:
    """One L-BFGS iteration (torch's no-line-search branch with
    ``max_iter=1``): returns updated flat params; mutates ``mem``.

    Matches torch/optim/lbfgs.py step() ordering exactly, including the
    quirks that matter for trajectory parity: ``s = d*t`` is the *recorded*
    step (external clamping between calls does not enter the history), the
    first step length is ``min(1, 1/sum|g|)·lr``, and the direction/step
    are saved to state even when the directional-derivative guard skips
    the parameter update.
    """
    g = np.asarray(grad, dtype=params.dtype).ravel()
    if np.abs(g).max() <= TOLERANCE_GRAD:
        return params  # torch returns before touching any state

    mem.n_iter += 1
    if mem.n_iter == 1:
        d = -g
        mem.old_dirs, mem.old_stps, mem.ro = [], [], []
        mem.h_diag = 1.0
    else:
        y = g - mem.prev_flat_grad
        s = mem.d * mem.t
        ys = float(y @ s)
        if ys > 1e-10:
            if len(mem.old_dirs) == mem.history_size:
                mem.old_dirs.pop(0)
                mem.old_stps.pop(0)
                mem.ro.pop(0)
            mem.old_dirs.append(y)
            mem.old_stps.append(s)
            mem.ro.append(1.0 / ys)
            mem.h_diag = ys / float(y @ y)
        num_old = len(mem.old_dirs)
        al = [0.0] * num_old
        q = -g
        for i in range(num_old - 1, -1, -1):
            al[i] = float(mem.old_stps[i] @ q) * mem.ro[i]
            q = q - al[i] * mem.old_dirs[i]
        r = q * mem.h_diag
        for i in range(num_old):
            be_i = float(mem.old_dirs[i] @ r) * mem.ro[i]
            r = r + (al[i] - be_i) * mem.old_stps[i]
        d = r

    mem.prev_flat_grad = g.copy()
    t = min(1.0, 1.0 / float(np.abs(g).sum())) * lr if mem.n_iter == 1 else lr
    gtd = float(g @ d)
    mem.d, mem.t = d, t
    if gtd > -TOLERANCE_CHANGE:
        return params  # direction not a descent direction; state kept
    return params + t * d
