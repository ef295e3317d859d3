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
