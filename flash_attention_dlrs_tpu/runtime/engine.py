"""DecodeEngine: continuous-batching generation over the paged KV cache.

Ties the stack together (north-star serving loop, no reference counterpart):
ContinuousBatchingScheduler (admission control) + PageAllocator (page
accounting, shared across layers) + models.decoding (prefill and the
one-dispatch-per-token decode step) — greedy sampling, EOS/budget
termination, slot backfill at step boundaries.

Static compile surface: ONE prefill program per prompt-length bucket and ONE
decode program total (slots × pages_per_seq fixed).  Inactive slots decode
against a reserved null page with length 0 (output ignored), so the decode
batch never changes shape.
"""

from __future__ import annotations

import warnings
from typing import Dict, Iterator, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry as geo

from ..models.decoding import (
    init_kv_pools,
    make_decode_step,
    make_prefill,
    make_verify_step,
    write_prompt_kv,
    write_prompt_kv_all,
    write_prompt_kv_batch,
)
from ..models.transformer import ModelConfig
from .native_alloc import make_page_allocator
from .sampling import (
    GREEDY,
    SamplingParams,
    batch_params,
    sample_tokens,
    speculative_verify,
)
from .scheduler import ContinuousBatchingScheduler, Request

_NULL_SEQ = "__null__"


def _next_pow2(n: int, floor: int = 128) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


class StreamEvent(NamedTuple):
    """One `DecodeEngine.generate_stream` event: a generated token
    (`done=False`), or end-of-request (`token=None, done=True`).
    ``logprob`` is the model's log P(token | prefix) — the pre-sampling
    log-softmax at the chosen token (None on done events)."""

    request_id: str
    token: Optional[int]
    done: bool
    logprob: Optional[float] = None


@jax.jit
def _token_logprobs(logits, tokens):
    """log-softmax of each row at the chosen token: [B, V], [B] → [B] f32."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lp, tokens[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]


class DecodeEngine:
    def __init__(
        self,
        params: Dict,
        cfg: ModelConfig,
        *,
        num_pages: int = 128,
        page_size: int = 256,
        num_slots: int = 4,
        pages_per_seq: int = 8,
        kv_dtype=jnp.bfloat16,
        quantized_kv: bool = False,
        eos_token: Optional[int] = None,
        pages_per_block: int | None = None,
        prefill_chunk: int = 0,  # 0 = dense prefill; >0 = chunked admission
        streaming_window: int = 0,  # StreamingLLM ring (full-attn models)
        attention_sinks: int = 0,  # pinned first tokens with the ring above
        enable_prefix_cache: bool = False,  # share full-page prompt prefixes
        native_allocator: Optional[bool] = None,  # None = auto-detect C++ lib
        mesh=None,  # jax.sharding.Mesh: tensor-parallel serving over ICI
        model_axis: str = "model",
        interpret: Optional[bool] = None,
    ):
        self.params = params
        self.cfg = cfg
        self.mesh = mesh
        self.model_axis = model_axis
        self.page_size = page_size
        self.pages_per_seq = pages_per_seq
        self.num_slots = num_slots
        self.eos_token = eos_token
        self.interpret = interpret

        # Sliding-window serving.  window >= max context: exact as-is (the
        # window can never clip).  window < max context with every layer
        # sliding: ROLLING ring — each sequence owns exactly window/page_size
        # pages, the write slot is pos % window (overwriting the oldest
        # token), and the attention length is clamped to the window.  The
        # residency invariant is "the last min(len, window) tokens", exactly
        # the sliding-window semantic; softmax is order-invariant, so the
        # ring rotation never matters, and RoPE phases were applied at the
        # token's TRUE position on insert.
        self.window = int(getattr(cfg, "window", 0) or 0)
        self.rolling = False
        if self.window and pages_per_seq * page_size > self.window:
            if getattr(cfg, "position_encoding", "rope") == "alibi":
                # The paged kernels' separable ALiBi bias assumes column
                # index == position order, which a rotated ring breaks.
                raise NotImplementedError(
                    "rolling sliding-window serving does not support ALiBi "
                    f"models — keep pages_per_seq*page_size <= {self.window}"
                )
            pattern = getattr(cfg, "window_pattern", "all")
            if pattern != "all":
                raise NotImplementedError(
                    f"window_pattern={pattern!r} (Gemma-2 style) mixes "
                    "sliding and full layers; the shared-ring serving path "
                    "supports uniformly-sliding models — keep "
                    f"pages_per_seq*page_size <= {self.window} for exact "
                    "full-residency serving"
                )
            if self.window % page_size:
                raise ValueError(
                    f"rolling sliding-window serving needs window "
                    f"({self.window}) divisible by page_size ({page_size})"
                )
            if prefill_chunk:
                raise NotImplementedError(
                    "rolling sliding-window serving is incompatible with "
                    "chunked prefill / speculative verification (tokens "
                    "written in one multi-token step would overwrite slots "
                    "earlier tokens of the same step must still attend)"
                )
            self.rolling = True
            pages_per_seq = self.window // page_size
            self.pages_per_seq = pages_per_seq

        # StreamingLLM serving (arXiv:2309.17453) for FULL-attention models:
        # pin the first `attention_sinks` tokens and ring the most recent
        # `streaming_window` — an explicit opt-in APPROXIMATION (the model
        # was trained with full attention; evicted middles change outputs
        # once len exceeds sinks+window), unlike the rolling mode above,
        # which is exact for models that ARE sliding-window.
        self.streaming = False
        if streaming_window:
            if self.window:
                raise ValueError(
                    "streaming_window is for full-attention models; "
                    "sliding-window models get the exact rolling ring "
                    "automatically"
                )
            if streaming_window % page_size or attention_sinks % page_size:
                raise ValueError(
                    f"streaming_window ({streaming_window}) and "
                    f"attention_sinks ({attention_sinks}) must be "
                    f"page_size ({page_size}) aligned"
                )
            if prefill_chunk:
                raise NotImplementedError(
                    "streaming eviction is incompatible with chunked "
                    "prefill / speculative verification (multi-token "
                    "writes overwrite slots earlier tokens still attend)"
                )
            self.streaming = True
            resident = attention_sinks + streaming_window
            if pages_per_seq * page_size >= resident:
                pages_per_seq = resident // page_size
                self.pages_per_seq = pages_per_seq
            else:
                raise ValueError(
                    f"pages_per_seq*page_size ({pages_per_seq * page_size}) "
                    f"is smaller than sinks+window ({resident})"
                )
        elif attention_sinks:
            raise ValueError("attention_sinks requires streaming_window > 0")

        # Shared ring state: _wrap = ring length, _sinks = pinned prefix.
        if self.rolling:
            self._wrap, self._sinks = self.window, 0
        elif self.streaming:
            self._wrap, self._sinks = streaming_window, attention_sinks
        else:
            self._wrap, self._sinks = 0, 0

        int4_kv = isinstance(kv_dtype, str) and kv_dtype == "int4"
        if int4_kv and not quantized_kv:
            raise ValueError("kv_dtype='int4' requires quantized_kv=True")
        # fp8 gate: on parts without an fp8 datapath (v5e and earlier) fp8
        # KV pages are CAST-bound — measured 69 GB/s vs int8's 691 on v5e —
        # so a silent fp8 request would be a 10× slowdown, not a feature.
        # Fall back to int8 (same payload width, faster, and within 0.0 ppl
        # in the eval gate) with a warning.
        if (
            quantized_kv
            and not int4_kv
            and jnp.dtype(kv_dtype).itemsize == 1
            and jnp.dtype(kv_dtype) != jnp.dtype(jnp.int8)
            and not geo.supports_fast_fp8()
        ):
            warnings.warn(
                f"kv_dtype={jnp.dtype(kv_dtype).name} has no fp8 datapath "
                f"on {geo.current_geometry().device_kind} (integer-dequant "
                "works but int8 is still ~1.4x faster there) — falling "
                "back to int8 KV.  Pass kv_dtype=jnp.int8 explicitly to "
                "silence this.",
                stacklevel=2,
            )
            kv_dtype = jnp.int8
        self.kv_dtype = kv_dtype

        self.pools = init_kv_pools(
            cfg, num_pages=num_pages, page_size=page_size,
            dtype=kv_dtype, quantized=quantized_kv,
        )
        if mesh is not None:
            # Tensor-parallel serving: params per the training TP plan
            # (heads/ff on the model axis), KV pools sharded on their
            # kv-head dim.  The decode/prefill programs stay UNCHANGED —
            # the flash-attention and paged-decode ops carry
            # custom_partitioning rules (ops/partitioning.py), so jit
            # propagates these shardings through every layer with zero
            # gathers; the host-side scheduler/allocator logic is
            # mesh-oblivious (page tables and tokens replicate).
            from jax.sharding import NamedSharding, PartitionSpec
            from ..models.train import _check_tp_divisibility, param_shardings

            _check_tp_divisibility(cfg, mesh, model_axis)
            self.params = jax.tree.map(
                jax.device_put, self.params,
                param_shardings(self.params, mesh, model_axis,
                                n_kv_heads=cfg.n_kv_heads),
            )
            pool_sh = NamedSharding(
                mesh, PartitionSpec(model_axis, None, None, None)
            )
            self.pools = jax.tree.map(
                lambda a: jax.device_put(a, pool_sh), self.pools
            )
        self.allocator = make_page_allocator(
            num_pages, page_size, native=native_allocator
        )
        self.allocator.allocate(_NULL_SEQ, 1)  # scratch page for idle slots
        self._null_page = self.allocator.page_tables[_NULL_SEQ][0]
        # decode_step_bookkeeping (python and native) zero-pads page-table
        # rows, and _step copies rows wholesale — padding slots point at page
        # 0.  That is only safe because _NULL_SEQ is allocated FIRST and gets
        # page 0; make the implicit invariant explicit.
        assert self._null_page == 0, (
            "null sequence must own page 0 (zero-padded page-table rows "
            f"alias it); got page {self._null_page}"
        )

        self.scheduler = ContinuousBatchingScheduler(
            num_slots=num_slots,
            can_allocate=self._can_admit,
            on_admit=self._admit,
            on_retire=self._retire,
        )
        self.slot_request: List[Optional[Request]] = [None] * num_slots
        self._slot_next_token = np.zeros(num_slots, np.int64)
        self._prefill = make_prefill(cfg, interpret=interpret)
        self.pages_per_block = pages_per_block
        self._decode_step = make_decode_step(
            cfg, pages_per_block=pages_per_block, interpret=interpret
        )
        self._verify_cache: Dict[int, object] = {}
        # Speculative serving (attach_draft): a draft engine mirroring this
        # engine's slots; step_burst then runs speculative rounds on device.
        self.spec_draft: Optional["DecodeEngine"] = None
        self.spec_gamma: int = 0
        self._draft_requests: Dict[int, Request] = {}
        self.spec_stats = {"rounds": 0, "proposed": 0, "accepted": 0}
        self.prefill_chunk = prefill_chunk
        if prefill_chunk:
            self._chunk_prefill = make_verify_step(
                cfg, prefill_chunk, pages_per_block=pages_per_block,
                interpret=interpret,
            )
        self.prefix_cache = None
        if enable_prefix_cache:
            if not prefill_chunk:
                raise ValueError(
                    "enable_prefix_cache requires prefill_chunk > 0 (the "
                    "suffix prefill runs through the chunked path)"
                )
            from .prefix_cache import PrefixCache

            self.prefix_cache = PrefixCache(self.allocator, page_size)
            # admission gate may free pages by evicting cache entries
            self.scheduler._can_allocate = self.prefix_cache.can_allocate

    # -- admission / retirement ------------------------------------------------

    def _can_admit(self, num_tokens: int) -> bool:
        """Scheduler admission gate: ring modes only ever allocate one
        resident set per sequence, whatever the request length."""
        if self._wrap:
            num_tokens = min(num_tokens, self._sinks + self._wrap)
        return self.allocator.can_allocate(num_tokens)

    def attach_draft(self, draft: "DecodeEngine", gamma: int = 4) -> None:
        """Enable speculative CONTINUOUS-BATCHING serving: ``draft`` mirrors
        every admission/retirement of this engine slot-for-slot (prompt
        prefill included), and :meth:`step_burst` switches from plain
        device-side bursts to speculative rounds (draft scan → fused
        verify/accept → device commit, runtime.speculative.make_spec_generate
        with per-slot budgets).  The draft conditions on the TARGET's
        committed stream — its own sampled tokens are proposals only, so
        outputs keep the target distribution (Leviathan-style rejection
        sampling; greedy output is bit-identical to plain bursts).

        ``draft`` must share vocab and page size, have the same slot count,
        and not be attached to anything itself.  Per-token logprobs are not
        produced under speculative serving (verification commits tokens,
        not per-step logits)."""
        if draft.page_size != self.page_size:
            raise ValueError("draft and target page sizes must match")
        if draft.num_slots < self.num_slots:
            raise ValueError("draft needs at least as many slots")
        if self._wrap or draft._wrap:
            raise NotImplementedError(
                "speculative serving is incompatible with ring-based modes"
            )
        if gamma < 2:
            raise ValueError("gamma must be >= 2")
        self.spec_draft = draft
        self.spec_gamma = gamma

    def _mirror_admit(self, req: Request, slot: int) -> None:
        d = self.spec_draft
        d_req = Request(
            request_id=req.request_id,
            prompt_tokens=list(req.prompt_tokens),
            # + gamma: the draft's in-flight proposals overshoot the
            # committed prefix by up to gamma pages' worth of tokens
            max_new_tokens=req.max_new_tokens + self.spec_gamma,
            eos_token=d.eos_token,
        )
        d._admit(d_req, slot)
        # the draft conditions on the TARGET's committed stream
        d._slot_next_token[slot] = self._slot_next_token[slot]
        d.allocator.seq_lengths[req.request_id] = len(req.prompt_tokens)
        self._draft_requests[slot] = d_req

    def _admit(self, req: Request, slot: int) -> None:
        if self.prefill_chunk:
            self._admit_chunked(req, slot)
        else:
            self._admit_dense(req, slot)
        if self.spec_draft is not None:
            self._mirror_admit(req, slot)

    def _admit_dense(self, req: Request, slot: int) -> None:
        prompt = np.asarray(req.prompt_tokens, np.int32)
        t = len(prompt)
        # Speculative serving writes the verify window γ positions past the
        # committed prefix — the cache needs that overhang even at the
        # request's final length.
        extra = self.spec_gamma if self.spec_draft is not None else 0
        if self._wrap:
            self.allocator.allocate(req.request_id, self._sinks + self._wrap)
        else:
            need = -(-(t + req.max_new_tokens + extra) // self.page_size)
            if need > self.pages_per_seq:
                raise ValueError(
                    f"request {req.request_id!r} needs {need} pages "
                    f"({t} prompt + {req.max_new_tokens} new tokens) but "
                    f"page tables hold pages_per_seq={self.pages_per_seq} — "
                    "raise pages_per_seq (or page_size)"
                )
            self.allocator.allocate(
                req.request_id, t + req.max_new_tokens + extra)
        pages = np.asarray(
            self.allocator.page_tables[req.request_id], np.int32
        )

        t_pad = _next_pow2(t)
        toks = np.zeros((1, t_pad), np.int32)
        toks[0, :t] = prompt
        logits, kvs = self._prefill(
            self.params, jnp.asarray(toks), jnp.asarray([t], jnp.int32)
        )
        resident = self._sinks + self._wrap
        long_ring = bool(self._wrap) and t > resident
        if long_ring:
            # Prompt longer than the resident set: the first `_sinks`
            # tokens pin in place and only the LAST `_wrap` tokens stay in
            # the ring.  Ring slot of pos >= sinks is
            # sinks + (pos - sinks) % wrap, so the last-wrap slice lands
            # rolled by (t - sinks) % wrap — one roll re-aligns the write
            # to page granularity (sinks are page-aligned by construction).
            w, sk = self._wrap, self._sinks
            n_pages_prompt = resident // self.page_size
        else:
            n_pages_prompt = -(-t // self.page_size)
        if long_ring:
            for li, (k, v) in enumerate(kvs):
                ring_k = jnp.roll(k[0, :, t - w:t], (t - sk) % w, axis=1)
                ring_v = jnp.roll(v[0, :, t - w:t], (t - sk) % w, axis=1)
                if sk:
                    kw = jnp.concatenate([k[0, :, :sk], ring_k], axis=1)
                    vw = jnp.concatenate([v[0, :, :sk], ring_v], axis=1)
                else:
                    kw, vw = ring_k, ring_v
                self.pools = write_prompt_kv(
                    self.pools, li, (kw, vw),
                    jnp.asarray(pages[:n_pages_prompt]),
                    self.page_size,
                )
        else:
            # one dispatch for all layers (write_prompt_kv_all docstring)
            self.pools = write_prompt_kv_all(
                self.pools, tuple(kvs),
                jnp.asarray(pages[:n_pages_prompt]), self.page_size,
            )
        self.allocator.seq_lengths[req.request_id] = t
        sp = req.sampling or GREEDY
        temp, top_k, top_p, seeds = batch_params([sp])
        first_token = int(
            sample_tokens(
                logits[:1], temp, top_k, top_p, seeds,
                jnp.asarray([t], jnp.int32),
            )[0]
        )
        req.output_tokens.append(first_token)
        if req.want_logprobs:
            req.output_logprobs.append(float(_token_logprobs(
                logits[:1], jnp.asarray([first_token]))[0]))
        self.slot_request[slot] = req
        self._slot_next_token[slot] = first_token

    def _admit_chunked(self, req: Request, slot: int) -> None:
        """Prefill through the multi-token verify kernel in fixed chunks:
        ONE compiled program serves every prompt length (the dense path
        compiles one program per pow2 length bucket), with bounded
        activation memory.  Real tokens sit at the END of each chunk so the
        kernel's per-row horizon (lengths − (C−1−t)) is exact for partial
        chunks; front-pad rows scatter their K/V to the null page and
        produce ignored outputs.
        """
        c = self.prefill_chunk
        prompt = np.asarray(req.prompt_tokens, np.int32)
        t = len(prompt)
        sid = req.request_id
        cached_tokens = 0
        extra = self.spec_gamma if self.spec_draft is not None else 0
        if self.prefix_cache is not None:
            shared_pages, cached_tokens = self.prefix_cache.match(
                req.prompt_tokens
            )
            self.prefix_cache.allocate_mixed_with_eviction(
                sid, shared_pages, t + req.max_new_tokens + extra
            )
        else:
            self.allocator.allocate(sid, t + req.max_new_tokens + extra)
        table = self.allocator.page_tables[sid]
        tbl = np.full((1, self.pages_per_seq), self._null_page, np.int32)
        tbl[0, : len(table)] = table

        logits = None
        done = cached_tokens  # cached prefix pages are already filled
        while done < t:
            r = min(c, t - done)  # real tokens in this chunk
            tokens = np.zeros((1, c), np.int32)
            positions = np.zeros((1, c), np.int32)
            rows = np.full((1, c), self._null_page, np.int32)
            offs = np.zeros((1, c), np.int32)
            tokens[0, c - r:] = prompt[done : done + r]
            for j in range(r):
                pos = done + j
                positions[0, c - r + j] = pos
                rows[0, c - r + j] = table[pos // self.page_size]
                offs[0, c - r + j] = pos % self.page_size
            lengths = np.asarray([done + r], np.int32)
            logits, self.pools = self._chunk_prefill(
                self.params, self.pools,
                jnp.asarray(tokens), jnp.asarray(positions),
                jnp.asarray(rows), jnp.asarray(offs), jnp.asarray(tbl),
                jnp.asarray(lengths),
            )
            done += r

        self.allocator.seq_lengths[sid] = t
        if self.prefix_cache is not None:
            self.prefix_cache.register(req.prompt_tokens, table)
        sp = req.sampling or GREEDY
        temp, top_k, top_p, seeds = batch_params([sp])
        first_token = int(
            sample_tokens(
                logits[:1, -1], temp, top_k, top_p, seeds,
                jnp.asarray([t], jnp.int32),
            )[0]
        )
        req.output_tokens.append(first_token)
        if req.want_logprobs:
            req.output_logprobs.append(float(_token_logprobs(
                logits[:1, -1], jnp.asarray([first_token]))[0]))
        self.slot_request[slot] = req
        self._slot_next_token[slot] = first_token

    def _admit_batch(self, reqs: Sequence[Request],
                     slots: Sequence[int]) -> None:
        """Admit a group of requests with ONE prefill dispatch, ONE
        KV-write dispatch, and ONE sampling readback (offline fixed-batch
        paths — generate_fused / generate_speculative*).  The per-request
        _admit path costs a prefill + an all-layers write + a blocking
        first-token readback EACH (~32 ms warm through the remote tunnel);
        batching makes admission O(1) dispatches in the batch size.

        Falls back to per-request admission for chunked-prefill and ring
        modes (their write paths are per-sequence by construction)."""
        if self.prefill_chunk or self._wrap or len(reqs) == 1:
            for r, s in zip(reqs, slots):
                self._admit(r, s)
            return
        n = len(reqs)
        ts = [len(r.prompt_tokens) for r in reqs]
        t_pad = _next_pow2(max(ts))
        toks = np.zeros((n, t_pad), np.int32)
        extra = self.spec_gamma if self.spec_draft is not None else 0
        max_pages = 0
        for i, r in enumerate(reqs):
            toks[i, : ts[i]] = r.prompt_tokens
            need = -(-(ts[i] + r.max_new_tokens + extra) // self.page_size)
            if need > self.pages_per_seq:
                raise ValueError(
                    f"request {r.request_id!r} needs {need} pages but "
                    f"pages_per_seq={self.pages_per_seq}"
                )
            self.allocator.allocate(
                r.request_id, ts[i] + r.max_new_tokens + extra)
            max_pages = max(max_pages, -(-ts[i] // self.page_size))
        pages_b = np.full((n, max_pages), self._null_page, np.int32)
        for i, r in enumerate(reqs):
            pp = self.allocator.page_tables[r.request_id]
            npp = -(-ts[i] // self.page_size)
            pages_b[i, :npp] = pp[:npp]

        lengths = jnp.asarray(ts, jnp.int32)
        logits, kvs = self._prefill(self.params, jnp.asarray(toks), lengths)
        self.pools = write_prompt_kv_batch(
            self.pools, tuple(kvs), jnp.asarray(pages_b), self.page_size
        )
        sps = [r.sampling or GREEDY for r in reqs]
        temp, top_k, top_p, seeds = batch_params(sps)
        first = np.asarray(sample_tokens(
            logits, temp, top_k, top_p, seeds, lengths
        ))  # ONE readback for the whole group
        lps = None
        if any(r.want_logprobs for r in reqs):
            lps = np.asarray(_token_logprobs(logits, jnp.asarray(first)))
        for i, (r, slot) in enumerate(zip(reqs, slots)):
            self.allocator.seq_lengths[r.request_id] = ts[i]
            tok = int(first[i])
            r.output_tokens.append(tok)
            if r.want_logprobs and lps is not None:
                r.output_logprobs.append(float(lps[i]))
            self.slot_request[slot] = r
            self._slot_next_token[slot] = tok
            if self.spec_draft is not None:
                self._mirror_admit(r, slot)

    def _retire(self, req: Request, slot: int) -> None:
        self.allocator.free(req.request_id)
        self.slot_request[slot] = None
        if self.spec_draft is not None:
            d_req = self._draft_requests.pop(slot, None)
            if d_req is not None:
                self.spec_draft._retire(d_req, slot)

    # -- decode ----------------------------------------------------------------

    def step(self) -> int:
        """One batched decode step across all active slots; returns the number
        of tokens generated."""
        active = [
            (i, r) for i, r in enumerate(self.slot_request)
            if r is not None and not r.finished
        ]
        if not active:
            return 0
        if self.spec_draft is not None:
            # A plain step would commit a token the draft never saw (its
            # cache would hold a stale hole at that position) — route
            # through a 1-token speculative burst instead.
            return self._step_burst_spec(active, 1)
        b = self.num_slots
        tokens = np.zeros(b, np.int32)
        positions = np.zeros(b, np.int32)
        rows = np.full(b, self._null_page, np.int32)
        offs = np.zeros(b, np.int32)
        tbl = np.full((b, self.pages_per_seq), self._null_page, np.int32)
        lens = np.zeros(b, np.int32)

        # One fused bookkeeping call (native C++ when available).
        sids = [req.request_id for _, req in active]
        rows_a, offs_a, tbl_a, pos_a, lens_a = (
            self.allocator.decode_step_bookkeeping(
                sids, self.pages_per_seq, self._wrap, self._sinks)
        )
        if self._wrap:
            # attention covers the resident set: sinks + the last
            # min(len - sinks, wrap) tokens; rope positions stay TRUE
            lens_a = np.minimum(lens_a, self._sinks + self._wrap)
        for i, (slot, req) in enumerate(active):
            tokens[slot] = self._slot_next_token[slot]
            positions[slot] = pos_a[i]
            rows[slot] = rows_a[i]
            offs[slot] = offs_a[i]
            tbl[slot] = tbl_a[i]
            lens[slot] = lens_a[i]

        logits, self.pools = self._decode_step(
            self.params, self.pools,
            jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(rows),
            jnp.asarray(offs), jnp.asarray(tbl), jnp.asarray(lens),
        )
        # Sampling-parameter arrays only change at admission boundaries —
        # rebuilding + re-uploading four device arrays per decode token is
        # avoidable hot-loop host work (same class as the allocator's
        # fused-bookkeeping cache).
        cache_key = tuple(
            id(self.slot_request[i]) if self.slot_request[i] else None
            for i in range(b)
        )
        if getattr(self, "_sample_cache_key", None) != cache_key:
            slot_params = [
                (self.slot_request[i].sampling if self.slot_request[i]
                 else None)
                for i in range(b)
            ]
            self._sample_cache = batch_params(slot_params)
            self._sample_cache_key = cache_key
        temp, top_k, top_p, seeds = self._sample_cache
        next_tokens = np.asarray(
            sample_tokens(
                logits, temp, top_k, top_p, seeds, jnp.asarray(lens)
            )
        )
        lps = None
        if any(req.want_logprobs for _, req in active):
            lps = np.asarray(_token_logprobs(logits, jnp.asarray(next_tokens)))
        for slot, req in active:
            tok = int(next_tokens[slot])
            req.output_tokens.append(tok)
            if req.want_logprobs and lps is not None:
                req.output_logprobs.append(float(lps[slot]))
            self._slot_next_token[slot] = tok
        self.scheduler.record_step(len(active))
        return len(active)

    def step_burst(self, max_steps: int = 8) -> int:
        """Up to ``max_steps`` lockstep decode steps for the current active
        set in ONE device dispatch (runtime.speculative.make_plain_generate
        with per-slot budgets); returns the number of tokens generated.

        This is the continuous-batching analogue of
        :meth:`generate_fused`: admission/retirement stay host-side (run
        :meth:`~Scheduler.schedule` between bursts), but the per-token
        decode loop — the part that pays the host dispatch floor every
        token through :meth:`step` — runs device-side.  Slots whose
        request budget ends mid-burst freeze in place (EOS freezes via the
        engine's eos token); the batch keeps lockstep.

        Falls back to per-token :meth:`step` loops when a request wants
        logprobs (needs per-step logits host-side) or under ring-based
        serving (per-token host bookkeeping)."""
        active = [
            (i, r) for i, r in enumerate(self.slot_request)
            if r is not None and not r.finished
        ]
        if not active:
            return 0
        if self._wrap or any(r.want_logprobs for _, r in active):
            total = 0
            for _ in range(max_steps):
                got = self.step()
                if not got:
                    break
                total += got
                if any(r.finished for _, r in active):
                    break  # let the scheduler retire/admit between bursts
            return total

        if self.spec_draft is not None:
            return self._step_burst_spec(active, max_steps)

        from .speculative import make_plain_generate

        b = self.num_slots
        k = max_steps
        x0 = np.zeros(b, np.int32)
        base_pos = np.zeros(b, np.int32)
        tbl = np.full((b, self.pages_per_seq), self._null_page, np.int32)
        budget = np.zeros(b, np.int32)
        for slot, req in active:
            sid = req.request_id
            x0[slot] = self._slot_next_token[slot]
            base_pos[slot] = self.allocator.seq_lengths[sid]
            tt = self.allocator.page_tables[sid]
            tbl[slot, : len(tt)] = tt
            budget[slot] = min(
                k, req.max_new_tokens - len(req.output_tokens)
            )

        key = ("burst", k)
        fused = self._verify_cache.get(key)
        if fused is None:
            fused = make_plain_generate(
                self.cfg, self.page_size, k,
                pages_per_block=self.pages_per_block,
                interpret=self.interpret,
            )
            self._verify_cache[key] = fused

        cache_key = tuple(
            id(self.slot_request[i]) if self.slot_request[i] else None
            for i in range(b)
        )
        if getattr(self, "_sample_cache_key", None) != cache_key:
            self._sample_cache = batch_params([
                (self.slot_request[i].sampling if self.slot_request[i]
                 else None)
                for i in range(b)
            ])
            self._sample_cache_key = cache_key
        temp, top_k, top_p, seeds = self._sample_cache
        eos = jnp.int32(-1 if self.eos_token is None else self.eos_token)
        is_active = np.zeros(b, bool)
        for slot, _ in active:
            is_active[slot] = True
        out, n_out, self.pools = fused(
            self.params, self.pools, jnp.asarray(x0), jnp.asarray(base_pos),
            jnp.asarray(tbl), jnp.asarray(is_active), eos, temp, top_k,
            top_p, seeds, jnp.asarray(budget),
        )
        out, n_out = jax.device_get((out, n_out))  # one transfer, not two
        total = 0
        for slot, req in active:
            got = int(n_out[slot])
            if got == 0:
                continue
            toks = [int(t) for t in out[slot, :got]]
            req.output_tokens.extend(toks)
            self._slot_next_token[slot] = toks[-1]
            # KV was written for each participating step's incoming token;
            # the final sampled token's K/V lands on the NEXT step — same
            # convention as :meth:`step`.
            self.allocator.seq_lengths[req.request_id] = (
                int(base_pos[slot]) + got
            )
            total += got
        self.scheduler.record_step(total)
        return total

    def _step_burst_spec(self, active, max_steps: int) -> int:
        """Speculative continuous-batching burst: up to ``max_steps``
        committed tokens per slot in ONE device dispatch — every
        draft-scan/verify/accept/commit round runs as device control flow
        (runtime.speculative.make_spec_generate with per-slot budgets).
        Admission/retirement stay host-side between bursts, exactly like
        the plain burst; the attached draft's cache tracks the target's
        committed prefix (in-flight overshoot rolled back by length
        bookkeeping)."""
        d = self.spec_draft
        gamma = self.spec_gamma
        b = self.num_slots
        k = max_steps
        x0 = np.zeros(b, np.int32)
        base_pos = np.zeros(b, np.int32)
        budget = np.zeros(b, np.int32)
        t_tbl = np.full((b, self.pages_per_seq), self._null_page, np.int32)
        d_tbl = np.full((b, d.pages_per_seq), d._null_page, np.int32)
        for slot, req in active:
            sid = req.request_id
            x0[slot] = self._slot_next_token[slot]
            base = self.allocator.seq_lengths[sid]
            base_pos[slot] = base
            budget[slot] = max(
                0, min(k, req.max_new_tokens - len(req.output_tokens))
            )
            # the draft overshoots its committed prefix by up to gamma
            # in-flight proposals; both caches need the headroom
            self.allocator.ensure_capacity(sid, base + budget[slot] + gamma)
            d.allocator.ensure_capacity(sid, base + budget[slot] + gamma)
            d.allocator.seq_lengths[sid] = base
            tt = self.allocator.page_tables[sid]
            t_tbl[slot, : len(tt)] = tt
            dt = d.allocator.page_tables[sid]
            d_tbl[slot, : len(dt)] = dt

        from .speculative import make_spec_generate

        key = ("specburst", gamma, k, id(d))
        fused = self._verify_cache.get(key)
        if fused is None:
            fused = make_spec_generate(
                self.cfg, d.cfg, gamma, self.page_size, k,
                t_pages_per_block=self.pages_per_block,
                d_pages_per_block=d.pages_per_block,
                interpret=self.interpret,
            )
            self._verify_cache[key] = fused

        cache_key = tuple(
            id(self.slot_request[i]) if self.slot_request[i] else None
            for i in range(b)
        )
        if getattr(self, "_sample_cache_key", None) != cache_key:
            self._sample_cache = batch_params([
                (self.slot_request[i].sampling if self.slot_request[i]
                 else None)
                for i in range(b)
            ])
            self._sample_cache_key = cache_key
        temp, top_k, top_p, seeds = self._sample_cache
        eos = jnp.int32(-1 if self.eos_token is None else self.eos_token)
        is_active = np.zeros(b, bool)
        for slot, _ in active:
            is_active[slot] = True

        (out, cnt, rounds, proposed, accepted, self.pools, d.pools) = fused(
            self.params, self.pools, d.params, d.pools,
            jnp.asarray(x0), jnp.asarray(base_pos), jnp.asarray(t_tbl),
            jnp.asarray(d_tbl), jnp.asarray(is_active), eos, temp, top_k,
            top_p, seeds, jnp.asarray(budget),
        )
        # ONE batched readback: each separate np.asarray/int() on a device
        # value is its own blocking transfer (~30 ms through the remote
        # tunnel; 5 of them dominated the whole burst).
        out, cnt, rounds, proposed, accepted = jax.device_get(
            (out, cnt, rounds, proposed, accepted))
        self.spec_stats["rounds"] += int(rounds)
        self.spec_stats["proposed"] += int(proposed)
        self.spec_stats["accepted"] += int(accepted)
        total = 0
        for slot, req in active:
            got = int(cnt[slot])
            if got == 0:
                continue
            toks = [int(t) for t in out[slot, :got]]
            req.output_tokens.extend(toks)
            self._slot_next_token[slot] = toks[-1]
            final = int(base_pos[slot]) + got
            self.allocator.seq_lengths[req.request_id] = final
            d.allocator.seq_lengths[req.request_id] = final
            total += got
        self.scheduler.record_step(total)
        return total

    def stats(self) -> Dict:
        """Operational snapshot: scheduler counters, slot/queue occupancy,
        and KV page utilization — the numbers a serving dashboard polls."""
        free = len(self.allocator.free_pages)
        # exclude the reserved null scratch page — same capacity the
        # admission check in generate_stream uses
        total = self.pools.k[0].shape[1] - 1
        s = self.scheduler.stats
        return {
            "admitted": s.admitted,
            "retired": s.retired,
            "steps": s.steps,
            "tokens_generated": s.tokens_generated,
            "active_slots": sum(r is not None for r in self.slot_request),
            "num_slots": self.num_slots,
            "queue_depth": len(self.scheduler.queue),
            "pages_total": total,
            "pages_free": free,
            "page_utilization": 1.0 - free / total,
            "rolling_window": self.window if self.rolling else 0,
            "streaming_window": self._wrap if self.streaming else 0,
            "attention_sinks": self._sinks,
            "kv_dtype": str(self.kv_dtype),
        }

    # -- public API --------------------------------------------------------------

    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        *,
        max_new_tokens: int = 16,
        max_steps: int = 10_000,
        sampling: Optional[SamplingParams] = None,
        return_logprobs: bool = False,
        burst: int = 1,
    ) -> List[List[int]]:
        """Generate for every prompt (continuous batching).  ``sampling``
        defaults to greedy; per-request control goes through the scheduler's
        Request.sampling field.  ``return_logprobs=True`` returns
        (tokens, logprobs) — per-token log P_model(token | prefix)."""
        outputs: Dict[str, List[int]] = {}
        lps: Dict[str, List[float]] = {}
        for ev in self.generate_stream(
            prompts, max_new_tokens=max_new_tokens, max_steps=max_steps,
            sampling=sampling, logprobs=return_logprobs, burst=burst,
        ):
            if ev.token is not None:
                outputs.setdefault(ev.request_id, []).append(ev.token)
                lps.setdefault(ev.request_id, []).append(ev.logprob)
        # generate_stream names requests req{i} in prompt order
        toks = [outputs.get(f"req{i}", []) for i in range(len(prompts))]
        if return_logprobs:
            return toks, [lps.get(f"req{i}", []) for i in range(len(prompts))]
        return toks

    def generate_stream(
        self,
        prompts: Sequence[Sequence[int]],
        *,
        max_new_tokens: int = 16,
        max_steps: int = 10_000,
        sampling: Optional[SamplingParams] = None,
        logprobs: bool = False,
        burst: int = 1,
    ) -> Iterator["StreamEvent"]:
        """Streaming form of :meth:`generate`: yields a ``StreamEvent`` per
        generated token as each batched decode step retires, then one
        ``done=True`` event per request (token=None).  Events for different
        requests interleave in step order — continuous batching means tokens
        stream for every active request concurrently.  Token-for-token
        identical to :meth:`generate` (which drains this iterator).
        ``logprobs=True`` attaches log P(token | prefix) to each event —
        opt-in because it costs a full-vocab log-softmax and an extra host
        transfer per decode step."""
        reqs = [
            Request(
                request_id=f"req{i}",
                prompt_tokens=list(p),
                max_new_tokens=max_new_tokens,
                eos_token=self.eos_token,
                sampling=sampling,
                want_logprobs=logprobs,
            )
            for i, p in enumerate(prompts)
        ]
        total_pages = self.pools.k[0].shape[1] - 1  # minus the null page
        for r in reqs:  # validate the WHOLE batch before submitting any —
            # a raise mid-loop must not leave orphaned requests queued
            need = (
                (self._sinks + self._wrap) // self.page_size if self._wrap
                else -(-(len(r.prompt_tokens) + r.max_new_tokens)
                       // self.page_size))
            if need > total_pages:
                raise MemoryError(
                    f"request {r.request_id!r} needs {need} pages but the pool "
                    f"only has {total_pages} — raise num_pages or shrink the request"
                )
            if not self._wrap and need > self.pages_per_seq:
                raise ValueError(
                    f"request {r.request_id!r} needs {need} pages but page "
                    f"tables hold pages_per_seq={self.pages_per_seq} — raise "
                    "pages_per_seq (or page_size)"
                )
        for r in reqs:
            self.scheduler.submit(r)
        reported = {r.request_id: 0 for r in reqs}
        done = set()

        def drain():
            for r in reqs:
                while reported[r.request_id] < len(r.output_tokens):
                    i = reported[r.request_id]
                    tok = r.output_tokens[i]
                    lp = (r.output_logprobs[i]
                          if i < len(r.output_logprobs) else None)
                    reported[r.request_id] += 1
                    yield StreamEvent(r.request_id, tok, False, lp)
                if r.finished and r.request_id not in done:
                    done.add(r.request_id)
                    yield StreamEvent(r.request_id, None, True)

        steps = 0
        while self.scheduler.has_work and steps < max_steps:
            self.scheduler.schedule()
            if not self.scheduler.active_slots:
                if self.scheduler.queue:
                    # Nothing running and the head still can't be admitted:
                    # no future retirement can free pages → deadlock.
                    raise RuntimeError(
                        "scheduler deadlock: queued work but no active slots "
                        "and insufficient free pages"
                    )
                steps += 1
                continue
            if burst > 1:
                self.step_burst(burst)
            else:
                self.step()
            steps += 1
            yield from drain()
        self.scheduler.schedule()  # final retirement
        yield from drain()
        for r in reqs:  # max_steps cutoff: close out unfinished requests
            if r.request_id not in done:
                done.add(r.request_id)
                yield StreamEvent(r.request_id, None, True)

    # -- speculative decoding ---------------------------------------------------

    def _single_decode_logits(self, sids, tokens_np):
        """One batched decode step for explicit (sid, token) pairs occupying
        slots 0..len(sids)−1; inserts the tokens' K/V and returns the raw
        next-token logits [num_slots, vocab]."""
        b = self.num_slots
        tokens = np.zeros(b, np.int32)
        positions = np.zeros(b, np.int32)
        rows = np.full(b, self._null_page, np.int32)
        offs = np.zeros(b, np.int32)
        tbl = np.full((b, self.pages_per_seq), self._null_page, np.int32)
        lens = np.zeros(b, np.int32)
        for slot, (sid, tok) in enumerate(zip(sids, tokens_np)):
            pos = self.allocator.seq_lengths[sid]
            self.allocator.ensure_capacity(sid, pos + 1)
            table = self.allocator.page_tables[sid]
            tokens[slot] = tok
            positions[slot] = pos
            rows[slot] = table[pos // self.page_size]
            offs[slot] = pos % self.page_size
            tbl[slot, : len(table)] = table
            lens[slot] = pos + 1
            self.allocator.seq_lengths[sid] = pos + 1
        logits, self.pools = self._decode_step(
            self.params, self.pools,
            jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(rows),
            jnp.asarray(offs), jnp.asarray(tbl), jnp.asarray(lens),
        )
        return logits

    def _single_decode(self, sids, tokens_np):
        """Greedy form of :meth:`_single_decode_logits`."""
        return np.asarray(
            jnp.argmax(self._single_decode_logits(sids, tokens_np), axis=-1)
        )

    def generate_speculative(
        self,
        prompts: Sequence[Sequence[int]],
        *,
        draft: "DecodeEngine",
        gamma: int = 4,
        max_new_tokens: int = 16,
        max_rounds: int = 10_000,
        sampling: Optional[SamplingParams] = None,
    ) -> List[List[int]]:
        """Speculative decoding: the ``draft`` engine proposes ``gamma``−1
        tokens per round, this (target) engine verifies them in ONE
        multi-token step and commits the accepted prefix plus a
        correction/bonus token.

        Greedy (``sampling`` None or temperature 0): output is IDENTICAL to
        plain greedy ``generate`` regardless of draft quality — only the
        round count (≈ tokens / acceptance) changes.  temperature > 0 uses
        rejection sampling (accept d with prob min(1, p(d)/q(d)), resample
        the first rejection from the residual norm(max(p−q, 0))), so the
        output token DISTRIBUTION equals plain sampling from the target —
        see runtime.sampling.speculative_verify.

        Both engines must share vocab, page size, and have enough slots for
        all prompts (no mid-flight admission in this mode).
        """
        n = len(prompts)
        if n > self.num_slots or n > draft.num_slots:
            raise ValueError(
                f"{n} prompts exceed slots (target {self.num_slots}, "
                f"draft {draft.num_slots})"
            )
        if self._wrap or draft._wrap:
            raise NotImplementedError(
                "speculative decoding is incompatible with ring-based "
                "serving (rolling window / streaming eviction): multi-token "
                "verification would overwrite ring slots its own earlier "
                "tokens still attend"
            )
        if draft.page_size != self.page_size:
            raise ValueError("draft and target page sizes must match")
        if gamma < 2:
            raise ValueError("gamma must be >= 2 (draft proposes gamma-1)")
        # Fused round programs (runtime/speculative.py): ONE dispatch for
        # the whole γ−1-step draft loop (device-side lax.scan + sampling)
        # and ONE for verify+accept — 2 dispatches/round instead of γ+2,
        # which is what makes measured end-to-end speedup dispatch-bound
        # environments (and real serving) see the algorithmic win.
        # Keyed on gamma with the draft held by weakref: id(draft) can be
        # recycled after GC, silently serving programs built for a dead
        # engine's cfg/page layout to a new one.
        import weakref

        cached = self._verify_cache.get(gamma)
        if cached is not None and cached[0]() is draft:
            spec_fns = cached[1]
        else:
            from .speculative import make_draft_propose, make_verify_accept

            spec_fns = (
                make_draft_propose(
                    draft.cfg, gamma, draft.page_size,
                    pages_per_block=draft.pages_per_block,
                    interpret=draft.interpret,
                ),
                make_verify_accept(
                    self.cfg, gamma, pages_per_block=self.pages_per_block,
                    interpret=self.interpret,
                ),
            )
            self._verify_cache[gamma] = (weakref.ref(draft), spec_fns)
        propose, verify_accept = spec_fns
        sp = sampling or GREEDY
        b = self.num_slots
        temp, top_k, top_p, seeds = batch_params([sp] * n + [None] * (b - n))

        # Admit everywhere (bypasses the scheduler: fixed batch, lockstep).
        reqs = [
            Request(request_id=f"spec{i}", prompt_tokens=list(p),
                    max_new_tokens=max_new_tokens, eos_token=self.eos_token,
                    sampling=sp)
            for i, p in enumerate(prompts)
        ]
        d_reqs = [
            Request(request_id=f"spec{i}", prompt_tokens=list(p),
                    max_new_tokens=max_new_tokens, eos_token=self.eos_token)
            for i, p in enumerate(prompts)
        ]
        slots = list(range(n))
        self._admit_batch(reqs, slots)
        draft._admit_batch(d_reqs, slots)
        for slot, r in enumerate(reqs):
            # The draft conditions on the TARGET's committed stream.
            draft._slot_next_token[slot] = r.output_tokens[0]
        sids = [r.request_id for r in reqs]
        outputs = [[r.output_tokens[0]] for r in reqs]

        # measured-acceptance telemetry (read by bench_speculative and the
        # stats dashboard): rounds run, proposals offered, proposals
        # accepted (committed minus the per-round correction/bonus token)
        self.spec_stats = {"rounds": 0, "proposed": 0, "accepted": 0}

        for _ in range(max_rounds):
            live = [
                i for i in range(n)
                if len(outputs[i]) < max_new_tokens and not (
                    self.eos_token is not None
                    and outputs[i][-1] == self.eos_token
                )
            ]
            if not live:
                break
            # x0 per slot: last committed token (pending insertion).
            x0 = np.asarray([outputs[i][-1] for i in range(n)], np.int64)
            base_pos_d = np.zeros(b, np.int32)
            base_pos_d[:n] = [draft.allocator.seq_lengths[s] for s in sids]

            # --- draft proposes gamma−1 continuation tokens ----------------
            # ONE dispatch (runtime.speculative.make_draft_propose): device-
            # side lax.scan runs the γ−1 decode steps with sampling between
            # — proposal d_j is SAMPLED from the draft's filtered
            # distribution q_{j-1} (greedy when temperature is 0), the
            # logits come back for rejection sampling, and the final
            # proposal's K/V is written so a fully-accepted round leaves the
            # draft cache complete.
            x0_b = np.zeros(b, np.int32)
            x0_b[:n] = x0
            d_tbl = np.full((b, draft.pages_per_seq), draft._null_page,
                            np.int32)
            for slot in range(n):
                sid = sids[slot]
                base = int(base_pos_d[slot])
                draft.allocator.ensure_capacity(sid, base + gamma)
                table = draft.allocator.page_tables[sid]
                d_tbl[slot, : len(table)] = table
                draft.allocator.seq_lengths[sid] = base + gamma
            props_b, draft_logits, draft.pools = propose(
                draft.params, draft.pools, jnp.asarray(x0_b),
                jnp.asarray(base_pos_d), jnp.asarray(d_tbl),
                temp, top_k, top_p, seeds,
            )
            # props_b stays ON DEVICE — it feeds verify_accept directly;
            # reading it back here would add a blocking tunnel round-trip
            # per round (measured ~30 ms in this environment).

            # --- target verify + accept/resample: ONE fused dispatch -------
            positions = np.zeros((b, gamma), np.int32)
            rows = np.full((b, gamma), self._null_page, np.int32)
            offs = np.zeros((b, gamma), np.int32)
            tbl = np.full((b, self.pages_per_seq), self._null_page, np.int32)
            lens = np.zeros(b, np.int32)
            base_pos = np.zeros(n, np.int32)
            for slot in range(n):
                sid = sids[slot]
                p0 = self.allocator.seq_lengths[sid]
                base_pos[slot] = p0
                self.allocator.ensure_capacity(sid, p0 + gamma)
                table = self.allocator.page_tables[sid]
                positions[slot] = p0 + np.arange(gamma)
                for j in range(gamma):
                    pos = p0 + j
                    rows[slot, j] = table[pos // self.page_size]
                    offs[slot, j] = pos % self.page_size
                tbl[slot, : len(table)] = table
                lens[slot] = p0 + gamma
            base_pos_b = np.zeros(b, np.int32)
            base_pos_b[:n] = base_pos
            round_tokens, n_committed, self.pools = verify_accept(
                self.params, self.pools, props_b,
                jnp.asarray(positions), jnp.asarray(rows),
                jnp.asarray(offs), jnp.asarray(tbl), jnp.asarray(lens),
                draft_logits, temp, top_k, top_p, seeds,
                jnp.asarray(base_pos_b),
            )
            round_tokens, n_committed = jax.device_get(
                (round_tokens, n_committed))  # one transfer
            self.spec_stats["rounds"] += 1
            self.spec_stats["proposed"] += len(live) * (gamma - 1)
            self.spec_stats["accepted"] += int(
                sum(n_committed[s] - 1 for s in live))

            live_set = set(live)
            for slot in live:
                sid = sids[slot]
                m = int(n_committed[slot]) - 1  # accepted proposals
                committed = [int(t) for t in round_tokens[slot, : m + 1]]
                budget = max_new_tokens - len(outputs[slot])
                for tok in committed[:budget]:
                    outputs[slot].append(tok)
                    if self.eos_token is not None and tok == self.eos_token:
                        break
                # cache holds x0, d1..d_m as valid prefix (m+1 tokens)
                self.allocator.seq_lengths[sid] = int(base_pos[slot]) + 1 + m
                draft.allocator.seq_lengths[sid] = int(base_pos[slot]) + 1 + m
            for slot in range(n):
                if slot not in live_set:
                    # Finished slots still ride the fixed-shape batched
                    # draft calls (which advance their lengths by gamma
                    # every round); roll them back so their page tables
                    # never grow — unchecked, a long-running batchmate
                    # leaks pages until the pool exhausts.
                    draft.allocator.seq_lengths[sids[slot]] = int(
                        base_pos_d[slot])

        for slot in range(n):
            self._retire(reqs[slot], slot)
            draft._retire(d_reqs[slot], slot)
        return outputs

    def generate_speculative_fused(
        self,
        prompts: Sequence[Sequence[int]],
        *,
        draft: "DecodeEngine",
        gamma: int = 4,
        max_new_tokens: int = 16,
        sampling: Optional[SamplingParams] = None,
    ) -> List[List[int]]:
        """Speculative decoding with EVERY round inside one device program
        (runtime.speculative.make_spec_generate): page capacity for the
        final lengths is ensured up front, the whole draft/verify/commit
        loop runs as device control flow, and the host reads back once.
        Same outputs as :meth:`generate_speculative`; lockstep fixed batch
        (no mid-flight admission).  This is the offline/throughput mode —
        the per-round form remains for continuous-batching serving."""
        from .speculative import make_spec_generate

        n = len(prompts)
        if n > self.num_slots or n > draft.num_slots:
            raise ValueError("prompts exceed slots")
        if self._wrap or draft._wrap:
            raise NotImplementedError(
                "speculative decoding is incompatible with ring-based "
                "serving modes"
            )
        if draft.page_size != self.page_size:
            raise ValueError("draft and target page sizes must match")
        if gamma < 2:
            raise ValueError("gamma must be >= 2")
        b = self.num_slots
        sp = sampling or GREEDY
        temp, top_k, top_p, seeds = batch_params([sp] * n + [None] * (b - n))

        reqs = [
            Request(request_id=f"specf{i}", prompt_tokens=list(p),
                    max_new_tokens=max_new_tokens, eos_token=self.eos_token,
                    sampling=sp)
            for i, p in enumerate(prompts)
        ]
        d_reqs = [
            Request(request_id=f"specf{i}", prompt_tokens=list(p),
                    max_new_tokens=max_new_tokens, eos_token=self.eos_token)
            for i, p in enumerate(prompts)
        ]
        slots = list(range(n))
        self._admit_batch(reqs, slots)
        draft._admit_batch(d_reqs, slots)
        sids = [r.request_id for r in reqs]
        outputs = [[r.output_tokens[0]] for r in reqs]
        max_new = max_new_tokens - 1  # first token came from prefill
        if max_new <= 0:
            for slot in range(n):
                self._retire(reqs[slot], slot)
                draft._retire(d_reqs[slot], slot)
            return outputs

        # Pre-ensure page capacity for the final length + gamma overhang:
        # nothing inside the device loop can allocate.
        x0 = np.zeros(b, np.int32)
        base_pos = np.zeros(b, np.int32)
        t_tbl = np.full((b, self.pages_per_seq), self._null_page, np.int32)
        d_tbl = np.full((b, draft.pages_per_seq), draft._null_page, np.int32)
        for slot in range(n):
            sid = sids[slot]
            x0[slot] = outputs[slot][0]
            base = self.allocator.seq_lengths[sid]
            base_pos[slot] = base
            self.allocator.ensure_capacity(sid, base + max_new + gamma)
            draft.allocator.ensure_capacity(sid, base + max_new + gamma)
            tt = self.allocator.page_tables[sid]
            t_tbl[slot, : len(tt)] = tt
            dt = draft.allocator.page_tables[sid]
            d_tbl[slot, : len(dt)] = dt

        key = ("fused", gamma, max_new, id(draft))
        fused = self._verify_cache.get(key)
        if fused is None:
            fused = make_spec_generate(
                self.cfg, draft.cfg, gamma, self.page_size, max_new,
                t_pages_per_block=self.pages_per_block,
                d_pages_per_block=draft.pages_per_block,
                interpret=self.interpret,
            )
            self._verify_cache[key] = fused
        eos = jnp.int32(-1 if self.eos_token is None else self.eos_token)
        active = jnp.asarray([s_ < n for s_ in range(b)], bool)
        import time as _time

        _t0 = _time.perf_counter()
        (out, cnt, rounds, proposed, accepted, self.pools, draft.pools) = (
            fused(
                self.params, self.pools, draft.params, draft.pools,
                jnp.asarray(x0), jnp.asarray(base_pos), jnp.asarray(t_tbl),
                jnp.asarray(d_tbl), active, eos, temp, top_k, top_p, seeds,
                jnp.full((b,), max_new, jnp.int32),
            )
        )
        out, cnt, rounds, proposed, accepted = jax.device_get(
            (out, cnt, rounds, proposed, accepted))  # one transfer, not 5
        # device-program wall time (excludes admission/prefill dispatches)
        # for benchmarking through jittery dispatch tunnels
        self.last_fused_seconds = _time.perf_counter() - _t0
        self.spec_stats = {
            "rounds": int(rounds),
            "proposed": int(proposed),
            "accepted": int(accepted),
        }
        for slot in range(n):
            sid = sids[slot]
            outputs[slot].extend(int(t) for t in out[slot, : cnt[slot]])
            final = int(base_pos[slot]) + int(cnt[slot])
            self.allocator.seq_lengths[sid] = final
            draft.allocator.seq_lengths[sid] = final
            self._retire(reqs[slot], slot)
            draft._retire(d_reqs[slot], slot)
        return outputs

    def generate_fused(
        self,
        prompts: Sequence[Sequence[int]],
        *,
        max_new_tokens: int = 16,
        sampling: Optional[SamplingParams] = None,
    ) -> List[List[int]]:
        """Plain generation with the whole decode loop in one device
        program (runtime.speculative.make_plain_generate) — the fair
        baseline for :meth:`generate_speculative_fused` and the fastest
        path for lockstep offline generation."""
        from .speculative import make_plain_generate

        n = len(prompts)
        if n > self.num_slots:
            raise ValueError("prompts exceed slots")
        if self._wrap:
            raise NotImplementedError(
                "fused generation does not support ring-based serving"
            )
        b = self.num_slots
        sp = sampling or GREEDY
        temp, top_k, top_p, seeds = batch_params([sp] * n + [None] * (b - n))
        reqs = [
            Request(request_id=f"plainf{i}", prompt_tokens=list(p),
                    max_new_tokens=max_new_tokens, eos_token=self.eos_token,
                    sampling=sp)
            for i, p in enumerate(prompts)
        ]
        self._admit_batch(reqs, list(range(n)))
        sids = [r.request_id for r in reqs]
        outputs = [[r.output_tokens[0]] for r in reqs]
        max_new = max_new_tokens - 1
        if max_new <= 0:
            for slot in range(n):
                self._retire(reqs[slot], slot)
            return outputs

        x0 = np.zeros(b, np.int32)
        base_pos = np.zeros(b, np.int32)
        tbl = np.full((b, self.pages_per_seq), self._null_page, np.int32)
        for slot in range(n):
            sid = sids[slot]
            x0[slot] = outputs[slot][0]
            base = self.allocator.seq_lengths[sid]
            base_pos[slot] = base
            self.allocator.ensure_capacity(sid, base + max_new)
            tt = self.allocator.page_tables[sid]
            tbl[slot, : len(tt)] = tt

        key = ("plain_fused", max_new)
        fused = self._verify_cache.get(key)
        if fused is None:
            fused = make_plain_generate(
                self.cfg, self.page_size, max_new,
                pages_per_block=self.pages_per_block,
                interpret=self.interpret,
            )
            self._verify_cache[key] = fused
        eos = jnp.int32(-1 if self.eos_token is None else self.eos_token)
        active = jnp.asarray([s_ < n for s_ in range(b)], bool)
        import time as _time

        _t0 = _time.perf_counter()
        out, n_out, self.pools = fused(
            self.params, self.pools, jnp.asarray(x0), jnp.asarray(base_pos),
            jnp.asarray(tbl), active, eos, temp, top_k, top_p, seeds,
            jnp.full(b, max_new, jnp.int32),
        )
        out, n_out = jax.device_get((out, n_out))  # one transfer
        self.last_fused_seconds = _time.perf_counter() - _t0
        for slot in range(n):
            sid = sids[slot]
            outputs[slot].extend(int(t) for t in out[slot, : n_out[slot]])
            self.allocator.seq_lengths[sid] = (
                int(base_pos[slot]) + int(n_out[slot])
            )
            self._retire(reqs[slot], slot)
        return outputs
