"""Fused speculative-decoding round programs.

The host-loop form in :meth:`DecodeEngine.generate_speculative` dispatches
γ+2 device programs per round ((γ−1) draft steps + a trailing draft KV
write + verify + accept) — per-dispatch overhead then bounds the speedup
regardless of model sizes (in this environment every dispatch also crosses
a remote-compile tunnel, which made round 2's "end-to-end" wall-clock
meaningless).  The TPU-native fix is control flow ON DEVICE: one jitted
program runs the whole draft loop (lax.scan over the γ−1 proposals with
sampling between steps), and a second fuses verification with the
accept/resample rule — 2 dispatches per round, independent of γ.

No reference counterpart (the reference has no serving at all); the
algorithm is Leviathan et al. 2023 via runtime.sampling.speculative_verify.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.decoding import make_decode_step, make_verify_step
from ..models.transformer import ModelConfig
from .sampling import sample_tokens, speculative_verify


def make_draft_propose(
    cfg: ModelConfig,
    gamma: int,
    page_size: int,
    *,
    pages_per_block: int | None = None,
    interpret: Optional[bool] = None,
):
    """One-dispatch draft proposal loop.

    (params, pools, x0 [B], base_pos [B], page_tbl [B, pps], temp, top_k,
    top_p, seeds) -> (proposals [B, γ], draft_logits [B, γ-1, V], pools)

    Semantics identical to γ−1 single decode steps with sampling between
    (engine._single_decode_logits loop): step j inserts the current token's
    K/V at position base_pos + j and samples proposal j+1 from the filtered
    draft distribution; a final step writes proposal γ−1's K/V so a fully
    accepted round leaves the draft cache complete.  Page capacity for
    base_pos + γ tokens must be pre-ensured by the host.
    """
    step = make_decode_step(
        cfg, pages_per_block=pages_per_block, interpret=interpret,
        _jit=False,
    )

    def propose(params, pools, x0, base_pos, page_tbl, temp, top_k, top_p,
                seeds):
        def body(carry, j):
            pools, cur = carry
            pos = base_pos + j
            rows = jnp.take_along_axis(
                page_tbl, (pos // page_size)[:, None], axis=1)[:, 0]
            offs = pos % page_size
            logits, pools = step(params, pools, cur, pos, rows, offs,
                                 page_tbl, pos + 1)
            nxt = sample_tokens(logits, temp, top_k, top_p, seeds, pos + 1)
            return (pools, nxt), (logits, nxt)

        (pools, _), (logits_seq, props) = jax.lax.scan(
            body, (pools, x0.astype(jnp.int32)),
            jnp.arange(gamma - 1, dtype=jnp.int32),
        )
        # final proposal's K/V write (logits unused)
        pos = base_pos + (gamma - 1)
        rows = jnp.take_along_axis(
            page_tbl, (pos // page_size)[:, None], axis=1)[:, 0]
        _, pools = step(params, pools, props[-1], pos, rows, pos % page_size,
                        page_tbl, pos + 1)
        proposals = jnp.concatenate(
            [x0.astype(jnp.int32)[None], props], axis=0)  # [γ, B]
        return (jnp.swapaxes(proposals, 0, 1),
                jnp.swapaxes(logits_seq, 0, 1), pools)

    return jax.jit(propose, donate_argnums=(1,))


def make_verify_accept(
    cfg: ModelConfig,
    gamma: int,
    *,
    pages_per_block: int | None = None,
    interpret: Optional[bool] = None,
):
    """Fused target verification + accept/resample in one dispatch.

    (params, pools, proposals [B, γ], positions, rows, offs, tbl, lens,
    draft_logits [B, γ-1, V], temp, top_k, top_p, seeds, base_pos)
    -> (round_tokens [B, γ], n_committed [B], pools)
    """
    verify = make_verify_step(
        cfg, gamma, pages_per_block=pages_per_block, interpret=interpret,
        _jit=False,
    )

    def verify_accept(params, pools, proposals, positions, rows, offs, tbl,
                      lens, draft_logits, temp, top_k, top_p, seeds,
                      base_pos):
        logits, pools = verify(params, pools, proposals, positions, rows,
                               offs, tbl, lens)
        round_tokens, n_committed = speculative_verify(
            logits, draft_logits, proposals, temp, top_k, top_p, seeds,
            base_pos,
        )
        return round_tokens, n_committed, pools

    return jax.jit(verify_accept, donate_argnums=(1,))


# ---------------------------------------------------------------------------
# Whole-generation fused programs: ONE dispatch for ALL rounds
# ---------------------------------------------------------------------------
#
# The 2-dispatch-per-round form above still pays a host sync per round (the
# committed tokens must come back before the next round's page bookkeeping).
# For lockstep fixed-batch generation the page tables can be pre-ensured for
# the final length once, after which NOTHING in the round loop needs the
# host: these programs run the entire generation — every draft scan, verify,
# accept and commit — inside one jitted lax.while_loop and read back once at
# the end.  This is the TPU-native shape of the algorithm (device-side
# control flow instead of a host scheduler; no reference counterpart — the
# reference has no serving path at all).


def _rows_offs(page_tbl, pos, page_size):
    rows = jnp.take_along_axis(page_tbl, pos[:, None] // page_size,
                               axis=1)[:, 0]
    return rows, pos % page_size


def make_plain_generate(
    cfg: ModelConfig,
    page_size: int,
    max_new: int,
    *,
    pages_per_block: int | None = None,
    interpret: Optional[bool] = None,
):
    """Plain autoregressive generation, whole loop in one dispatch.

    (params, pools, x0 [B], base_pos [B], page_tbl, active [B] bool, eos,
    temp, top_k, top_p, seeds, budget [B])
    -> (out [B, max_new], n_out [B], pools)

    ``active`` marks real slots; padding slots start done (they still ride
    the lockstep batch, writing to their null page).

    ``budget`` is a traced per-slot step cap ≤ max_new — the serving burst
    path (DecodeEngine.step_burst) uses it to stop slots whose request
    budget runs out mid-burst while the batch keeps lockstep (finished
    slots keep stepping with ``cur`` frozen; their KV writes land past
    their own live prefix or on the null page, never attended).

    ``eos`` is a traced int32 scalar; pass -1 to disable.  Page capacity
    for base_pos + max_new tokens must be pre-ensured by the host.
    """
    step = make_decode_step(
        cfg, pages_per_block=pages_per_block, interpret=interpret,
        _jit=False,
    )

    def generate(params, pools, x0, base_pos, page_tbl, active, eos, temp,
                 top_k, top_p, seeds, budget):
        b = x0.shape[0]
        out = jnp.zeros((b, max_new), jnp.int32)
        done0 = ~active
        cnt0 = jnp.zeros(b, jnp.int32)

        def cond(c):
            i, _, _, done, _, _ = c
            return jnp.logical_and(i < max_new, ~jnp.all(done))

        def body(c):
            i, pools, cur, done, out, cnt = c
            # Clamp to the slot's own budget so a frozen slot never writes
            # past its allocation: an overflowing page-table gather would
            # CLAMP to the slot's last real page and the junk write could
            # land inside the valid prefix (which prefix caching may pin
            # beyond this request's life).  A frozen slot rewrites its last
            # real (cur, pos) pair instead — bit-identical, so idempotent.
            pos = base_pos + jnp.minimum(i, jnp.maximum(budget, 1) - 1)
            rows, offs = _rows_offs(page_tbl, pos, page_size)
            logits, pools = step(params, pools, cur, pos, rows, offs,
                                 page_tbl, pos + 1)
            nxt = sample_tokens(logits, temp, top_k, top_p, seeds, pos + 1)
            nxt = jnp.where(done, 0, nxt)
            out = out.at[:, i].set(nxt)
            cnt = cnt + jnp.where(done, 0, 1)
            done = jnp.logical_or(done, nxt == eos)
            done = jnp.logical_or(done, i + 1 >= budget)
            return i + 1, pools, jnp.where(done, cur, nxt), done, out, cnt

        i, pools, _, done, out, cnt = jax.lax.while_loop(
            cond, body, (jnp.int32(0), pools, x0.astype(jnp.int32), done0,
                         out, cnt0)
        )
        return out, cnt, pools

    return jax.jit(generate, donate_argnums=(1,))


def make_spec_generate(
    t_cfg: ModelConfig,
    d_cfg: ModelConfig,
    gamma: int,
    page_size: int,
    max_new: int,
    *,
    t_pages_per_block: int | None = None,
    d_pages_per_block: int | None = None,
    interpret: Optional[bool] = None,
):
    """Speculative generation, ALL rounds in one dispatch.

    (t_params, t_pools, d_params, d_pools, x0 [B], base_pos [B],
    t_tbl [B, pps_t], d_tbl [B, pps_d], active [B] bool, eos, temp, top_k,
    top_p, seeds, budget [B])
    -> (out [B, max_new], n_out [B], rounds, proposed, accepted,
        t_pools, d_pools)

    ``budget`` is a traced per-slot commit cap ≤ max_new (the serving
    spec-burst passes each request's remaining token budget; offline
    callers pass max_new everywhere).  A slot freezes once cnt reaches
    its budget while the batch keeps lockstep — same contract as
    make_plain_generate's budget.

    Semantics per round are identical to DecodeEngine.generate_speculative
    (draft scan -> fused verify/accept -> commit), with the commit done on
    device: per-slot committed counts advance both engines' logical lengths
    (base_pos + n_out IS the valid cache prefix), tokens scatter into the
    output buffer, EOS/budget freeze a slot while the batch keeps lockstep.
    Page capacity for base_pos + max_new + gamma must be pre-ensured on
    BOTH engines (the draft overshoots its committed prefix by up to gamma
    in flight; frozen slots keep overwriting the same gamma positions).
    """
    d_step = make_decode_step(
        d_cfg, pages_per_block=d_pages_per_block, interpret=interpret,
        _jit=False,
    )
    verify = make_verify_step(
        t_cfg, gamma, pages_per_block=t_pages_per_block, interpret=interpret,
        _jit=False,
    )

    def generate(t_params, t_pools, d_params, d_pools, x0, base_pos, t_tbl,
                 d_tbl, active, eos, temp, top_k, top_p, seeds, budget):
        b = x0.shape[0]
        out = jnp.zeros((b, max_new), jnp.int32)
        gam = jnp.arange(gamma, dtype=jnp.int32)

        def cond(c):
            rounds, _, _, _, cnt, done, *_ = c
            del cnt
            return jnp.logical_and(rounds < max_new, ~jnp.all(done))

        def body(c):
            (rounds, t_pools, d_pools, cur, cnt, done, out, proposed,
             accepted) = c
            base = base_pos + cnt  # committed length per slot

            # --- draft proposes gamma-1 tokens (device scan) -------------
            def draft_body(carry, j):
                d_pools, tok = carry
                pos = base + j
                rows, offs = _rows_offs(d_tbl, pos, page_size)
                logits, d_pools = d_step(d_params, d_pools, tok, pos, rows,
                                         offs, d_tbl, pos + 1)
                nxt = sample_tokens(logits, temp, top_k, top_p, seeds,
                                    pos + 1)
                return (d_pools, nxt), (logits, nxt)

            (d_pools, _), (d_logits, props) = jax.lax.scan(
                draft_body, (d_pools, cur),
                jnp.arange(gamma - 1, dtype=jnp.int32),
            )
            pos_l = base + (gamma - 1)
            rows_l, offs_l = _rows_offs(d_tbl, pos_l, page_size)
            _, d_pools = d_step(d_params, d_pools, props[-1], pos_l, rows_l,
                                offs_l, d_tbl, pos_l + 1)
            proposals = jnp.swapaxes(
                jnp.concatenate([cur[None], props], axis=0), 0, 1
            )  # [B, gamma]
            d_logits = jnp.swapaxes(d_logits, 0, 1)  # [B, gamma-1, V]

            # --- target verify + accept/resample -------------------------
            positions = base[:, None] + gam[None, :]
            rows = jnp.take_along_axis(t_tbl, positions // page_size, axis=1)
            offs = positions % page_size
            t_logits, t_pools = verify(t_params, t_pools, proposals,
                                       positions, rows, offs, t_tbl,
                                       base + gamma)
            round_tokens, n_comm = speculative_verify(
                t_logits, d_logits, proposals, temp, top_k, top_p, seeds,
                base,
            )

            # --- device-side commit ---------------------------------------
            live = ~done
            proposed = proposed + jnp.sum(
                jnp.where(live, gamma - 1, 0).astype(jnp.int32))
            accepted = accepted + jnp.sum(
                jnp.where(live, n_comm - 1, 0).astype(jnp.int32))
            m = jnp.where(live, n_comm, 0)
            m = jnp.maximum(
                jnp.minimum(m, jnp.minimum(budget, max_new) - cnt), 0
            )  # budget caps (never negative: frozen slots stay frozen)
            # EOS cap (eos = -1 never matches)
            hit = jnp.logical_and(
                round_tokens == eos, gam[None, :] < m[:, None]
            )
            any_hit = jnp.any(hit, axis=1)
            first = jnp.argmax(hit.astype(jnp.int32), axis=1)
            m = jnp.where(any_hit, jnp.minimum(m, first + 1), m)
            done = jnp.logical_or(done, any_hit)
            cols = cnt[:, None] + gam[None, :]
            valid = gam[None, :] < m[:, None]
            out = out.at[
                jnp.arange(b)[:, None],
                jnp.where(valid, cols, max_new),  # OOB -> dropped
            ].set(jnp.where(valid, round_tokens, 0), mode="drop")
            new_cur = round_tokens[
                jnp.arange(b), jnp.maximum(m - 1, 0)
            ]
            cur = jnp.where(m > 0, new_cur, cur)
            cnt = cnt + m
            done = jnp.logical_or(
                done, cnt >= jnp.minimum(budget, max_new))
            return (rounds + 1, t_pools, d_pools, cur, cnt, done, out,
                    proposed, accepted)

        z = jnp.zeros((b,), jnp.int32)
        (rounds, t_pools, d_pools, _, cnt, _, out, proposed, accepted) = (
            jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), t_pools, d_pools, x0.astype(jnp.int32), z,
                 ~active, out, jnp.int32(0), jnp.int32(0)),
            )
        )
        return out, cnt, rounds, proposed, accepted, t_pools, d_pools

    return jax.jit(generate, donate_argnums=(1, 3))
