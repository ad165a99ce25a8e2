"""Neal's doubling slice kernel on the free-running CGGibbs automaton.

This puts the LAST of the six univariate slice kernels on the fast
engine, closing the reference's "all functions from qslice are available"
claim (R/mcmcglm.R:35-39) at full freerun speed.  The lockstep form is
``ops/slice_kernels.py::slice_doubling`` (Neal 2003, Figs. 4-6); what
kept doubling off the automaton until now is that its shrinkage accept
rule is not a single comparison: every proposal that passes the level
test must ALSO pass the back-test of Fig. 6 — a halving walk back down
the doubling sequence, each step of which may need a fresh target
evaluation.  That is a nested evaluation loop in the lockstep kernel,
but the automaton's whole design is "one target evaluation per device
pass" — so the back-test simply becomes two more automaton phases:

  phase 0 — expansion.  ``stepdir`` sequences the endpoint evaluations:
      0 = the initial left endpoint, 1 = the initial right endpoint,
      2/3 = a just-doubled left/right endpoint.  After each endpoint
      evaluation (except the very first) the lane decides: keep doubling
      while either endpoint is above the level and budget remains
      (Fig. 4's ``p``), choosing the side with the pass coin; otherwise
      snapshot the final interval into (eL, eR) with its endpoint flags
      (e_aL, e_aR) and enter shrinkage.
  phase 1 — shrink proposal.  The pass evaluates the candidate drawn
      uniformly on the current (L, R).  Below the level: reject, shrink
      toward b0, next candidate next pass.  At/above the level with an
      interval that was NEVER doubled (eR - eL <= 1.1 w): the back-test
      is vacuous, so the lane commits THIS pass — the evaluated e /
      ld(e) are the new state for free, exactly the stepping-out accept
      path.  At/above the level after >= 1 doubling: stash the candidate
      in ``x1``, open the back-test interval (hatL, hatR) = (eL, eR)
      with the expansion's endpoint flags, take the first halving (pure
      register math — no evaluation), and schedule the new midpoint for
      the next pass.
  phase 2 — back-test halving.  The pass evaluates the midpoint M that
      the previous pass scheduled; M *is* one of (hatL, hatR), so its
      slice flag lands on that side (the other side's flag is inherited
      — where the lockstep kernel re-evaluates BOTH endpoints each
      halving, the automaton carries flags and pays one evaluation).
      Then Fig. 6 verbatim: if the halvings have separated x0 from x1
      (``dsep``) and both endpoints sit at/below the level, x1 could not
      have generated the doubled interval — reject it and shrink the
      main interval; if the back-test interval is still wider than
      1.1 w, halve again; otherwise x1 is accepted.
  phase 3 — commit.  The accepted x1 is re-scheduled as the pass
      proposal and commits unconditionally: the evaluation gives the
      committed eta and refreshed log-density cache through the standard
      accept machinery.  (One extra pass per backtested coordinate; the
      never-doubled hot path — warmed-up, well-sized w — skips phases 2
      and 3 entirely and costs exactly the stepping-out schedule.)

Equivalence with the lockstep kernel is distributional (same kernel law,
different PRNG consumption order), the same contract as every other
freerun kernel: tests/test_freerun_doubling.py.  Evaluation COUNTS are
lower than the lockstep kernel's (flags replace the back-test's paired
endpoint re-evaluations), so nev comparisons across engines are not
meaningful for doubling.

Restricted to ``spec_k=1`` (the classic one-evaluation pass): the
K-speculative batteries assume the all-rejections proposal recursion
needs no evaluations, which the back-test breaks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["DoublingState", "run_pass_doubling"]


class DoublingState(NamedTuple):
    """FreeRunState plus the doubling back-test registers.

    The first block mirrors :class:`mcmcglm_tpu.freerun.FreeRunState`
    field-for-field (everything batched over chains); the extension
    block carries Neal Fig. 6's state.  ``budL`` is repurposed as the
    remaining doubling budget; ``budR`` is unused (zeros)."""

    # -- FreeRunState block (see freerun.py for field docs) --
    beta: jax.Array
    eta: jax.Array
    ld0: jax.Array
    key: jax.Array
    logw: jax.Array
    j: jax.Array
    phase: jax.Array  # 0 expand, 1 propose, 2 back-test, 3 commit
    stepdir: jax.Array  # expansion sequencing: 0 init-L, 1 init-R, 2/3 doubled-L/R
    level: jax.Array
    L: jax.Array
    R: jax.Array
    budL: jax.Array  # remaining doublings (Fig. 4's p)
    budR: jax.Array  # unused
    b0: jax.Array
    lp0: jax.Array
    w: jax.Array
    xprop: jax.Array
    n_shrink: jax.Array
    nev: jax.Array
    # -- doubling extension, all (C,) --
    x1: jax.Array  # pending proposal under back-test
    eL: jax.Array  # expansion's final interval (back-test restart point)
    eR: jax.Array
    e_aL: jax.Array  # f(eL) > level  (bool)
    e_aR: jax.Array
    hatL: jax.Array  # current back-test interval
    hatR: jax.Array
    h_aL: jax.Array  # f(hatL) > level  (bool)
    h_aR: jax.Array
    dsep: jax.Array  # Fig. 6's D: a halving separated x0 from x1 (bool)


def run_pass_doubling(eng, s: DoublingState, sweep_count, draws, nevbuf,
                      n_sweeps: int, adapt: bool, shrink_only: bool,
                      stepout_sweeps=None):
    """One target evaluation + doubling-automaton advance for every chain.

    Same contract as :func:`run_pass` (ops/freerun_passes.py): returns
    ``(new_state, sweep_count, draws, nevbuf)``.  ``adapt`` /
    ``shrink_only`` / ``stepout_sweeps`` are accepted for driver parity
    but ignored — doubling always runs its full schedule with the fixed
    user width, matching the lockstep engine (only stepping_out is in
    engine._ADAPTIVE_KERNELS)."""
    del adapt, shrink_only, stepout_sweeps
    dtype = eng.dtype
    C = s.beta.shape[0]
    rows = jnp.arange(C)
    active = sweep_count < n_sweeps

    # pass-level randomness: one batched block, as run_pass.  The pass
    # uniform u_pass serves whichever single role the lane's phase
    # needs this pass: expansion side coin OR shrink-proposal position.
    nb = eng._n_begin_u
    key, k_u = jax.random.split(s.key)
    R4 = jax.random.uniform(k_u, (C, 1 + nb), dtype=dtype)
    u_pass = R4[:, 0]

    # -- the single fused evaluation at s.xprop --
    xg = jnp.take(eng.Xt, s.j, axis=0)  # (C, n) row gather
    delta = s.xprop - s.b0
    e = s.eta + xg * delta[:, None]
    ld_e = eng._ld_eta(e, eng.y, eng.extra)
    if eng.eval_cache == "scalar":
        lsum_e = eng.reduce_fn(ld_e)
        dll = lsum_e - s.ld0
    else:
        dll = eng.reduce_fn(ld_e - s.ld0)
    f = dll + (
        jnp.asarray(eng._coord_lp(s.beta, s.j, s.xprop), dtype) - s.lp0
    )
    above = f > s.level  # endpoint-flag sense (Fig. 4/6 use strict >)

    expanding = s.phase == 0
    proposing = s.phase == 1
    backtesting = s.phase == 2
    committing = s.phase == 3

    # -- phase 0: expansion ------------------------------------------------
    # merge this pass's endpoint evaluation into the expansion flags
    e_aL = jnp.where(
        expanding & ((s.stepdir == 0) | (s.stepdir == 2)), above, s.e_aL
    )
    e_aR = jnp.where(
        expanding & ((s.stepdir == 1) | (s.stepdir == 3)), above, s.e_aR
    )
    init_L_done = expanding & (s.stepdir == 0)  # next: initial R endpoint
    decide = expanding & (s.stepdir != 0)  # loop decision after this eval
    keep_doubling = decide & (e_aL | e_aR) & (s.budL > 0)
    go_left = u_pass < 0.5
    width = s.R - s.L
    L = jnp.where(keep_doubling & go_left, s.L - width, s.L)
    R = jnp.where(keep_doubling & ~go_left, s.R + width, s.R)
    budL = jnp.where(keep_doubling, s.budL - 1, s.budL)
    exp_done = decide & ~keep_doubling
    # snapshot the final interval: the back-test restarts from it for
    # EVERY proposal of this coordinate (lockstep acceptable() inits
    # (hatL, hatR) from the doubling result, not the shrunk interval)
    eL = jnp.where(exp_done, L, s.eL)
    eR = jnp.where(exp_done, R, s.eR)

    # -- phase 1: shrink proposal evaluated this pass ----------------------
    ok_level = f >= s.level
    # never-doubled interval: |eR - eL| = w <= 1.1 w, Fig. 6 is vacuous
    trivial = (s.eR - s.eL) <= 1.1 * s.w
    accept_now = proposing & ok_level & trivial & active
    need_bt = proposing & ok_level & ~trivial & active
    rej_level = proposing & ~ok_level

    # -- phase 2: back-test midpoint evaluated this pass -------------------
    # the evaluated M IS one of (hatL, hatR); its flag lands on that side
    h_aL = jnp.where(backtesting & (s.xprop == s.hatL), above, s.h_aL)
    h_aR = jnp.where(backtesting & (s.xprop == s.hatR), above, s.h_aR)
    bt_fail = backtesting & s.dsep & ~h_aL & ~h_aR
    bt_cont = backtesting & ~bt_fail & ((s.hatR - s.hatL) > 1.1 * s.w)
    bt_pass = backtesting & ~bt_fail & ~bt_cont & active

    # next halving (pure register math): entering lanes start from the
    # expansion snapshot; continuing lanes from the current interval
    x1 = jnp.where(need_bt, s.xprop, s.x1)
    bhL = jnp.where(need_bt, s.eL, s.hatL)
    bhR = jnp.where(need_bt, s.eR, s.hatR)
    bdsep = jnp.where(need_bt, False, s.dsep)
    h_aL = jnp.where(need_bt, e_aL, h_aL)
    h_aR = jnp.where(need_bt, e_aR, h_aR)
    halve = need_bt | bt_cont
    M = 0.5 * (bhL + bhR)
    cross = ((s.b0 < M) & (x1 >= M)) | ((s.b0 >= M) & (x1 < M))
    dsep = jnp.where(halve, bdsep | cross, bdsep)
    m_right = x1 < M  # x1 below M => M becomes the new RIGHT endpoint
    hatL = jnp.where(halve & ~m_right, M, bhL)
    hatR = jnp.where(halve & m_right, M, bhR)

    # -- rejection (level or back-test): shrink the main interval ---------
    rejected = rej_level | bt_fail
    rej_x = jnp.where(bt_fail, s.x1, s.xprop)
    L = jnp.where(rejected & (rej_x < s.b0), rej_x, L)
    R = jnp.where(rejected & (rej_x >= s.b0), rej_x, R)
    n_shrink = jnp.where(rejected, s.n_shrink + 1, s.n_shrink)
    exhausted = rejected & (n_shrink >= eng.max_shrink) & active

    # -- commit ------------------------------------------------------------
    # accept_now and committing lanes both commit THIS pass's evaluation
    # (for committing lanes xprop was re-scheduled to x1 by bt_pass, so
    # e / ld(e) are the accepted proposal's — the standard free commit)
    accept_move = accept_now | (committing & active)
    commit = accept_move | exhausted
    b_star = jnp.where(accept_move, s.xprop, s.b0)
    eta = jnp.where(accept_move[:, None], e, s.eta)
    if eng.eval_cache == "scalar":
        ld0 = jnp.where(accept_move, lsum_e, s.ld0)
    else:
        ld0 = jnp.where(accept_move[:, None], ld_e, s.ld0)
    beta = eng._commit_row(s.beta, s.j, b_star)
    logw = s.logw  # no width adaptation: lockstep parity (fixed user w)

    # coordinate / sweep bookkeeping (identical to run_pass)
    nev_new = s.nev + active.astype(jnp.int32)
    j_next = jnp.where(commit, s.j + 1, s.j)
    sweep_done = commit & (j_next >= eng.d)
    slot = jnp.where(sweep_done, sweep_count, n_sweeps)
    draws, nevbuf = eng._sweep_buffers(
        draws, nevbuf, rows, slot, beta, nev_new, sweep_done
    )
    sweep_count = jnp.where(sweep_done, sweep_count + 1, sweep_count)
    j_next = jnp.where(sweep_done, 0, j_next)

    reg = eng._begin_coord(key, beta, logw, j_next, shrink_only=False,
                           ubatch=R4[:, 1:1 + nb])

    def pick(name, old):
        return jnp.where(commit, reg[name], old)

    # next-pass proposal for non-committing lanes (disjoint cases)
    x_shrink = L + (R - L) * u_pass
    xprop_nc = s.xprop
    xprop_nc = jnp.where(init_L_done, s.R, xprop_nc)
    xprop_nc = jnp.where(keep_doubling, jnp.where(go_left, L, R), xprop_nc)
    xprop_nc = jnp.where(exp_done | rejected, x_shrink, xprop_nc)
    xprop_nc = jnp.where(halve, M, xprop_nc)
    xprop_nc = jnp.where(bt_pass, x1, xprop_nc)

    phase = s.phase
    phase = jnp.where(exp_done, 1, phase)
    phase = jnp.where(halve, 2, phase)
    phase = jnp.where(bt_fail, 1, phase)
    phase = jnp.where(bt_pass, 3, phase)
    stepdir = s.stepdir
    stepdir = jnp.where(init_L_done, 1, stepdir)
    stepdir = jnp.where(keep_doubling, jnp.where(go_left, 2, 3), stepdir)

    # freeze INACTIVE lanes' automaton registers (same boundary-idle
    # hazard as run_pass: an idle lane must resume exactly where it
    # paused, or boundary tails corrupt its coordinate draw)
    def keep(new, old):
        return jnp.where(active, new, old)

    new_state = type(s)(
        beta=beta, eta=eta, ld0=ld0, key=key, logw=logw,
        j=j_next,
        phase=keep(pick("phase", phase), s.phase),
        stepdir=keep(pick("stepdir", stepdir), s.stepdir),
        level=pick("level", s.level),
        L=keep(pick("L", L), s.L), R=keep(pick("R", R), s.R),
        budL=keep(pick("budL", budL), s.budL),
        budR=s.budR,
        b0=pick("b0", s.b0), lp0=pick("lp0", s.lp0),
        w=pick("w", s.w),
        xprop=keep(pick("xprop", xprop_nc), s.xprop),
        n_shrink=keep(pick("n_shrink", n_shrink), s.n_shrink),
        nev=nev_new,
        x1=keep(pick("x1", x1), s.x1),
        eL=keep(pick("eL", eL), s.eL),
        eR=keep(pick("eR", eR), s.eR),
        e_aL=keep(pick("e_aL", e_aL), s.e_aL),
        e_aR=keep(pick("e_aR", e_aR), s.e_aR),
        hatL=keep(pick("hatL", hatL), s.hatL),
        hatR=keep(pick("hatR", hatR), s.hatR),
        h_aL=keep(pick("h_aL", h_aL), s.h_aL),
        h_aR=keep(pick("h_aR", h_aR), s.h_aR),
        dsep=keep(pick("dsep", dsep), s.dsep),
    )
    return new_state, sweep_count, draws, nevbuf
