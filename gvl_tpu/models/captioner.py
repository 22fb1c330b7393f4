"""Captioning heads.

Behavioral spec: reference pdvc/CaptioningHead/ —
- 'standard' = LSTM-DSA (LSTM_DSA.py): an LSTM whose per-step visual context
  is deformable soft attention around the event's reference point. This is
  the head every shipped config uses.
- 'light' = plain LSTM over [word emb ; event feature] (LSTM.py).
- 'none' = puppet zero head (Puppet.py).
('transformer' DSA and 'gpt2' ClipCap heads are built on the same machinery
and routed through build_captioner as they land.)

TPU redesign vs the reference:
- the reference's data-dependent early `break` in the decode loops
  (LSTM_DSA.py:111,186-187) becomes fixed-length loops with `unfinished`
  masking — identical outputs, static shapes;
- the memory value projection is hoisted out of the per-step loop (the
  reference re-projects the whole memory every token step inside
  MSDeformAttnCap.forward — pure waste);
- sampling runs batched over all (video, event) pairs at once.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gvl_tpu.models.layers import _directional_offset_bias
from gvl_tpu.ops.ms_deform_attn import _prep_taps, ms_deform_attn_1d_sampled_values


class LSTMCellNoBias(nn.Module):
    """Single-layer LSTM cell with torch gate ordering (i, f, g, o) and no
    bias, matching the reference's nn.LSTM(..., bias=False).

    `gates`/`ih_matrix` expose the cell in split form so teacher forcing can
    hoist the input-side contributions that don't depend on the recurrent
    state out of the serial token chain (see LSTMDSACaptioner.__call__)."""
    features: int

    def setup(self):
        self.ih = nn.Dense(4 * self.features, use_bias=False)
        self.hh = nn.Dense(4 * self.features, use_bias=False)

    def __call__(self, carry, x):
        return self.gates(carry, self.ih(x))

    def gates(self, carry, z_ih):
        """Apply the recurrent half + nonlinearity given the already-computed
        input-side pre-activation z_ih = x @ W_ih."""
        h, c = carry
        z = z_ih + self.hh(h)
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    def ih_matrix(self, in_features: int, dtype) -> jnp.ndarray:
        """The ih kernel (in_features, 4*features), materializing the param
        if this is the first touch (init). The 1-row dummy matmul is noise;
        callers slice the kernel to apply it to input SEGMENTS separately
        (exact up to f32 summation order: the Dense has no bias)."""
        _ = self.ih(jnp.zeros((1, in_features), dtype))
        return self.ih.variables["params"]["kernel"]


def _log_softmax_f32(z: jnp.ndarray) -> jnp.ndarray:
    """log_softmax at f32 regardless of the compute dtype: under bf16
    caption compute (train_caption_bf16 / eval bf16 decode) the V-wide
    logits matmul stays bf16 on the MXU, but the normalization that feeds
    the NLL loss / caption scores runs at full precision (the exp/log is
    VPU work, negligible next to the matmul)."""
    return jax.nn.log_softmax(z.astype(jnp.float32), axis=-1)


def caption_nll(logprobs: jnp.ndarray, targets: jnp.ndarray,
                mask: jnp.ndarray) -> jnp.ndarray:
    """Per-sequence masked NLL (reference: Captioner.build_loss,
    LSTM_DSA.py:48-52): mean over valid steps of -logprob[target].

    logprobs (N, Tsteps, V); targets/mask (N, Tcap) where the loss uses
    targets[:, :Tsteps] against logprobs.
    """
    Tsteps = logprobs.shape[1]
    tgt = targets[:, :Tsteps]
    m = mask[:, :Tsteps].astype(logprobs.dtype)
    picked = jnp.take_along_axis(logprobs, tgt[..., None], axis=-1)[..., 0]
    return -(picked * m).sum(-1) / (m.sum(-1) + 1e-6)


def rl_loss(sample_logprobs: jnp.ndarray, gen_seq: jnp.ndarray,
            reward: jnp.ndarray) -> jnp.ndarray:
    """SCST policy-gradient loss (reference: Captioner.build_rl_loss,
    LSTM_DSA.py:54-61): -logprob * advantage over generated-token positions
    (mask shifted right by one so the first token always counts)."""
    mask = (gen_seq > 0).astype(sample_logprobs.dtype)
    mask = jnp.concatenate([jnp.ones_like(mask[:, :1]), mask[:, :-1]], axis=1)
    out = -sample_logprobs * reward * mask
    return out.sum() / (mask.sum() + 1e-6)


def prepare_dsa_reference(reference, valid_ratios, temporal_shapes,
                          n_levels: int, n_points: int):
    """Normalize a (B,Ne,1|2) event reference into the prepared
    [center, offset_scale] form (B,Ne,L,2) that DeformableSoftAttention
    consumes: sampling location = center + raw_offset * offset_scale.

    - width-2 (box-refined (cx, w)): center = cx*vr_l, scale = w*vr_l/(2P)
      (reference ms_deform_attn_for_caption.py:116-124 scales offsets by
      w/(2*n_points));
    - width-1 (center only): center = cx*vr_l, scale = 1/T_l (offsets live
      on the level's normalized grid, LSTM_DSA.py:87-94).

    Folding the width branch into data (instead of a shape branch inside
    the head) lets callers concatenate events with HETEROGENEOUS reference
    widths — e.g. all decoder layers' matched events in one fused
    teacher-forcing call (train/state.py fuse_caption_layers).
    """
    shapes = jnp.asarray(temporal_shapes[:n_levels], jnp.float32)
    vr = valid_ratios[:, :n_levels]                       # (B, L)
    c = reference[:, :, None, 0] * vr[:, None, :]         # (B, Ne, L)
    if reference.shape[-1] == 2:
        s = (reference[:, :, None, 1] * vr[:, None, :]) / n_points * 0.5
    else:
        s = jnp.broadcast_to(1.0 / shapes[None, None, :], c.shape)
    return jnp.stack([c, s], axis=-1)                     # (B, Ne, L, 2)


class DeformableSoftAttention(nn.Module):
    """The per-step visual context of LSTM-DSA: sample n_heads*n_levels*
    n_points taps around each event's reference point, then pool them with
    additive attention conditioned on the LSTM state.

    Reference: MSDeformAttnCap (ms_deform_attn_for_caption.py) +
    ShowAttendTellCore.forward (LSTM_DSA.py:241-271).
    """
    d_model: int
    n_levels: int
    n_heads: int
    n_points: int
    att_hid_size: int
    rnn_size: int
    sampled_impl: str = "twohot"   # 'twohot' (MXU matmul, O(R*S) rows) |
                                   # 'gather' (take_along_axis, O(R)) —
                                   # 'auto' upstream picks gather at large S

    def setup(self):
        H, L, P = self.n_heads, self.n_levels, self.n_points
        bias0 = _directional_offset_bias(H, L, P).reshape(H, L, P)
        bias0 = (bias0 - bias0.mean(axis=2, keepdims=True)).reshape(-1)
        self.sampling_offsets = nn.Dense(
            H * L * P, kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: bias0)
        # (the reference's MSDeformAttnCap also declares attention_weights /
        # output_proj Linears, but the return_value=True path never applies
        # them — the checkpoint importer drops those tensors explicitly)
        self.value_proj = nn.Dense(self.d_model,
                                   kernel_init=nn.initializers.xavier_uniform())
        self.ctx2att = nn.Dense(self.att_hid_size)
        self.h2att = nn.Dense(self.att_hid_size)
        self.alpha_net = nn.Dense(1)

    def project_value(self, memory, memory_mask):
        """Pre-projected value memory, hoisted out of the token loop (the
        reference re-projects the whole memory every step).

        Measured note: additionally hoisting ctx2att (exact via affinity of
        linear maps over convex samples) LOSES ~17% end-to-end on v5e under
        both sampling impls — the doubled sampled width costs more than the
        saved per-step Dense (A/B: 2450 vs 2000 clips/s with 'twohot').
        """
        v = self.value_proj(memory)
        if memory_mask is not None:
            v = jnp.where(memory_mask[..., None], v, 0.0)
        B, S = v.shape[:2]
        Dh = self.d_model // self.n_heads
        return v.reshape(B, S, self.n_heads, Dh)

    def __call__(self, joint_query, h_state, reference_points, value,
                 temporal_shapes: Sequence[int]):
        """joint_query (B,Ne,2C|3C); h_state (B,Ne,R); reference_points
        PREPARED [center, offset_scale] (B,Ne,L,2) from
        prepare_dsa_reference; value from project_value (B,S,H,Dh).
        Returns (B,Ne,H*Dh)."""
        B, Ne, _ = joint_query.shape
        H, L, P = self.n_heads, self.n_levels, self.n_points
        Dh = self.d_model // H

        offsets = self.sampling_offsets(joint_query).reshape(B, Ne, H, L, P)
        loc = (reference_points[:, :, None, :, None, 0]
               + offsets * reference_points[:, :, None, :, None, 1])

        impl = self.sampled_impl
        if impl == "auto":
            # measured on v5e: twohot stays ahead of gather even at
            # YouMakeup S=1500 (80us vs 455us/call, tools/
            # bench_longvideo_parts.py) — XLA keeps the 2-sparse rows on the
            # MXU; 'gather' remains selectable for pathological S
            impl = "twohot"
        taps = ms_deform_attn_1d_sampled_values(
            value, tuple(int(t) for t in temporal_shapes), loc,
            jnp.ones_like(offsets),
            impl=impl)                                 # (B, Ne, H, K, Dh)
        att = self.ctx2att(taps)

        att_h = self.h2att(h_state)[:, :, None, None, :]
        dot = jnp.tanh(att + att_h)
        alpha = self.alpha_net(dot)[..., 0]            # (B, Ne, H, K)
        alpha = jax.nn.softmax(alpha, axis=-1)
        att_res = jnp.einsum("bnhk,bnhkd->bnhd", alpha, taps)
        return att_res.reshape(B, Ne, H * Dh)


class LSTMDSACaptioner(nn.Module):
    """'standard' caption head. See module docstring."""
    vocab_size: int
    input_encoding_size: int
    rnn_size: int
    d_model: int
    n_levels: int
    n_heads: int
    n_points: int
    att_hid_size: int
    max_caption_len: int
    drop_prob: float = 0.5
    with_query_pos: bool = False  # enable_pos_emb_for_captioner
    scan_loops: bool = False      # lax.scan token loops (lower compile time/
                                  # memory) vs unrolled (faster steps)
    sampled_impl: str = "twohot"  # DSA sampling op (see
                                  # DeformableSoftAttention.sampled_impl)
    tf_input_hoist: bool = True   # teacher forcing: apply the LSTM ih kernel
                                  # to the token-embedding and query segments
                                  # OUTSIDE the serial token chain (exact up
                                  # to f32 summation order; False = the
                                  # naive per-step concat+matmul oracle)

    def setup(self):
        self.embed = nn.Embed(self.vocab_size + 1, self.input_encoding_size,
                              embedding_init=nn.initializers.uniform(scale=0.1))
        self.logit = nn.Dense(self.vocab_size + 1,
                              kernel_init=nn.initializers.uniform(scale=0.1))
        self.dropout = nn.Dropout(self.drop_prob)
        self.dsa = DeformableSoftAttention(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            self.att_hid_size, self.rnn_size,
            sampled_impl=self.sampled_impl)
        self.cell = LSTMCellNoBias(self.rnn_size)

    def _prepare(self, reference, valid_ratios, temporal_shapes, memory,
                 memory_mask, ref_prepared: bool = False):
        """Per-call setup shared by train and sample: expand references to
        the captioner's levels (possibly fewer than the transformer's —
        reference: LSTM_DSA.py:87-94) and pre-project memory values.
        ref_prepared: `reference` is already the (B,Ne,L,2) output of
        prepare_dsa_reference (the fused multi-layer caption path)."""
        shapes = tuple(int(t) for t in temporal_shapes[:self.n_levels])
        total = sum(shapes)
        memory = memory[:, :total]
        memory_mask = memory_mask[:, :total] if memory_mask is not None else None
        if ref_prepared:
            ref = reference
        else:
            ref = prepare_dsa_reference(reference, valid_ratios,
                                        temporal_shapes, self.n_levels,
                                        self.n_points)
        value = self.dsa.project_value(memory, memory_mask)
        return ref, value, shapes

    def _step_core(self, it, carry, query, ref, value, shapes,
                   deterministic):
        """One recurrence step WITHOUT the vocab projection. it (B,Ne)
        int32; carry = (h, c) each (B,Ne,R). Returns (carry, out) with out
        (B,Ne,R) the dropped-out cell output. The vocab logits are applied
        by the caller: in teacher forcing (no scheduled sampling) nothing
        in the recurrence consumes them, so they hoist OUT of the serial
        token chain into one batched matmul over all steps."""
        h, c = carry
        xt = self.embed(it)                                     # (B,Ne,E)
        joint_query = jnp.concatenate([h, query], axis=-1)
        att_res = self.dsa(joint_query, h, ref, value, shapes)
        inp = jnp.concatenate([xt, att_res, query], axis=-1)
        B, Ne = it.shape
        (h2, c2), out = self.cell((h.reshape(B * Ne, -1), c.reshape(B * Ne, -1)),
                                  inp.reshape(B * Ne, -1))
        out = self.dropout(out, deterministic=deterministic)
        return (h2.reshape(B, Ne, -1), c2.reshape(B, Ne, -1)), \
            out.reshape(B, Ne, -1)

    def _step(self, it, carry, query, ref, value, shapes, deterministic):
        """One token step. Returns RAW logits (B,Ne,V+1) — callers
        normalize only where they need true logprobs (the greedy loop gets
        by with argmax + logsumexp, skipping a V-wide normalized
        materialization per step)."""
        carry, out = self._step_core(it, carry, query, ref, value, shapes,
                                     deterministic)
        return carry, self.logit(out)

    def _tf_hidden_states(self, seq, query, ref, value, shapes,
                          deterministic):
        """Teacher-forced recurrence over all Lc-1 steps -> dropped-out cell
        outputs (B,Ne,T,R). With tf_input_hoist, the per-step LSTM input
        z = [xt; att_res; query] @ W_ih splits by linearity into
        xt@W_x (ALL steps in one batched matmul — the tokens are known ahead
        in teacher forcing), query@W_q (once), and only att_res@W_a stays on
        the serial chain — ~1/3 of the per-step input matmul FLOPs off the
        latency-critical path. Exact up to f32 summation order (the Dense
        has no bias)."""
        B, Ne, Lc = seq.shape
        T = Lc - 1
        R = self.rnn_size
        h = jnp.zeros((B, Ne, R), query.dtype)
        c = jnp.zeros((B, Ne, R), query.dtype)

        if not self.tf_input_hoist:
            if self.scan_loops:
                def body_tf(mod, carry, it):
                    carry, out = mod._step_core(it, carry, query, ref, value,
                                                shapes, deterministic)
                    return carry, out
                scan = nn.scan(body_tf, variable_broadcast="params",
                               split_rngs={"params": False, "dropout": True},
                               in_axes=0, out_axes=0, unroll=4)
                _, hs = scan(self, (h, c), jnp.moveaxis(seq[:, :, :T], 2, 0))
                return jnp.moveaxis(hs, 0, 2)
            hs = []
            carry = (h, c)
            for t in range(T):
                carry, out = self._step_core(seq[:, :, t], carry, query, ref,
                                             value, shapes, deterministic)
                hs.append(out)
            return jnp.stack(hs, axis=2)

        E, C = self.input_encoding_size, self.d_model
        Q = query.shape[-1]
        Wih = self.cell.ih_matrix(E + C + Q, query.dtype)
        xt_all = self.embed(seq[:, :, :T])                  # (B,Ne,T,E)
        z_x = xt_all @ Wih[:E]                              # batched, off-chain
        z_q = query @ Wih[E + C:]                           # constant per step
        W_att = Wih[E:E + C]

        def hoisted_step(z_x_t, h, c):
            joint_query = jnp.concatenate([h, query], axis=-1)
            att_res = self.dsa(joint_query, h, ref, value, shapes)
            z_ih = z_x_t + att_res @ W_att + z_q
            (h2, c2), out = self.cell.gates(
                (h.reshape(B * Ne, -1), c.reshape(B * Ne, -1)),
                z_ih.reshape(B * Ne, -1))
            out = self.dropout(out, deterministic=deterministic)
            return (h2.reshape(B, Ne, -1), c2.reshape(B, Ne, -1),
                    out.reshape(B, Ne, -1))

        if self.scan_loops:
            def body_tf(mod, carry, z_x_t):
                h, c = carry
                h, c, out = hoisted_step(z_x_t, h, c)
                return (h, c), out
            scan = nn.scan(body_tf, variable_broadcast="params",
                           split_rngs={"params": False, "dropout": True},
                           in_axes=0, out_axes=0, unroll=4)
            _, hs = scan(self, (h, c), jnp.moveaxis(z_x, 2, 0))
            return jnp.moveaxis(hs, 0, 2)

        hs = []
        for t in range(T):
            h, c, out = hoisted_step(z_x[:, :, t], h, c)
            hs.append(out)
        return jnp.stack(hs, axis=2)

    def teacher_forced_nll(self, query, reference, memory, memory_mask,
                           temporal_shapes, valid_ratios, seq, seq_mask,
                           deterministic: bool = True,
                           ref_prepared: bool = False):
        """Per-event masked NLL (B,Ne) of teacher forcing: exactly
        caption_nll over __call__'s logprobs, but fused — picked-logit minus
        logsumexp — so the (B,Ne,T,V) NORMALIZED logprob tensor (~1 GB at
        fused flagship shapes) is never materialized; the raw logits feed
        one reduction and one tiny gather instead (HBM-traffic win in both
        fwd and bwd). No scheduled sampling (callers fall back to __call__ +
        caption_nll when ss_prob > 0)."""
        ref, value, shapes = self._prepare(reference, valid_ratios,
                                           temporal_shapes, memory,
                                           memory_mask, ref_prepared)
        hs = self._tf_hidden_states(seq, query, ref, value, shapes,
                                    deterministic)
        z = self.logit(hs).astype(jnp.float32)              # (B,Ne,T,V)
        lse = jax.scipy.special.logsumexp(z, axis=-1)
        tgt = seq[:, :, 1:]
        picked = jnp.take_along_axis(z, tgt[..., None], axis=-1)[..., 0]
        m = seq_mask[:, :, 1:].astype(jnp.float32)
        return -((picked - lse) * m).sum(-1) / (m.sum(-1) + 1e-6)

    def __call__(self, query, reference, memory, memory_mask, temporal_shapes,
                 valid_ratios, seq, deterministic: bool = True,
                 ss_prob: float = 0.0, ref_prepared: bool = False):
        """Teacher-forced logprobs.

        query (B,Ne,C or 2C w/ pos); reference (B,Ne,1|2) — or the prepared
        (B,Ne,L,2) form when ref_prepared; seq (B,Ne,Lc) int.
        Returns logprobs (B,Ne,Lc-1,V+1). The reference's early break when
        all sequences end is replaced by computing all Lc-1 steps and masking
        the loss. ss_prob > 0 enables scheduled sampling: with that
        probability the input token is drawn from the previous step's
        distribution instead of the GT (reference: LSTM_DSA.py:97-107).
        """
        B, Ne = seq.shape[:2]
        ref, value, shapes = self._prepare(reference, valid_ratios,
                                           temporal_shapes, memory,
                                           memory_mask, ref_prepared)
        use_ss = (not deterministic) and (
            not isinstance(ss_prob, (int, float)) or ss_prob > 0)

        if not use_ss:
            # teacher forcing proper: the recurrence never reads the
            # logits, so only run the serial chain over the cell outputs
            # (with the input-side hoist — see _tf_hidden_states) and apply
            # the vocab projection + log-softmax ONCE over all steps — one
            # MXU-shaped matmul instead of Lc-1 latency-chained ones
            # (exact: logit is per-row linear, log-softmax row-wise)
            hs = self._tf_hidden_states(seq, query, ref, value, shapes,
                                        deterministic)
            return _log_softmax_f32(self.logit(hs))

        if not self.scan_loops:
            # unrolled loop: XLA fuses across steps — fastest on-device
            # (measured 68.7ms vs 116ms scanned per flagship train step)
            carry = (jnp.zeros((B, Ne, self.rnn_size), query.dtype),
                     jnp.zeros((B, Ne, self.rnn_size), query.dtype))
            outs = []
            prev_lp = None
            for t in range(seq.shape[-1] - 1):
                it = seq[:, :, t]
                if t >= 1 and prev_lp is not None:
                    rng = self.make_rng("sample")
                    r1, r2 = jax.random.split(rng)
                    sampled = jax.random.categorical(r1, prev_lp).astype(
                        it.dtype)
                    take = jax.random.uniform(r2, it.shape) < ss_prob
                    it = jnp.where(take, sampled, it)
                carry, z = self._step(it, carry, query, ref, value, shapes,
                                      deterministic)
                lp = _log_softmax_f32(z)
                prev_lp = lp
                outs.append(lp)
            return jnp.stack(outs, axis=2)                      # (B,Ne,Lc-1,V)

        # lax.scan variant: compile time flat in Lc, lower peak memory
        Tsteps = seq.shape[-1] - 1

        def body(mod, carry, xs):
            h, c, prev_lp = carry
            it, is_first = xs
            rng = mod.make_rng("sample")
            r1, r2 = jax.random.split(rng)
            sampled = jax.random.categorical(r1, prev_lp).astype(it.dtype)
            take = (jax.random.uniform(r2, it.shape) < ss_prob) & \
                jnp.logical_not(is_first)
            it = jnp.where(take, sampled, it)
            (h, c), z = mod._step(it, (h, c), query, ref, value, shapes,
                                  deterministic)
            lp = _log_softmax_f32(z)
            return (h, c, lp), lp

        V = self.vocab_size + 1
        carry0 = (jnp.zeros((B, Ne, self.rnn_size), query.dtype),
                  jnp.zeros((B, Ne, self.rnn_size), query.dtype),
                  jnp.zeros((B, Ne, V)))
        xs = (jnp.moveaxis(seq[:, :, :Tsteps], 2, 0),
              jnp.arange(Tsteps) == 0)
        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True, "sample": True},
                       in_axes=0, out_axes=0, unroll=4)
        _, lps = scan(self, carry0, xs)
        return jnp.moveaxis(lps, 0, 2)                          # (B,Ne,Lc-1,V)

    def sample(self, query, reference, memory, memory_mask, temporal_shapes,
               valid_ratios, greedy: bool = True, temperature: float = 1.0,
               deterministic: bool = True, early_exit: bool = False,
               ref_prepared: bool = False):
        """Autoregressive decode for all (B, Ne) events at once.

        Returns (seq, logprobs): (B, Ne, max_caption_len) token ids (0 after
        EOS) and per-step chosen-token logprobs. Matches the reference's
        `unfinished` masking semantics (LSTM_DSA.py:180-190) with a fixed
        step count — or, with early_exit (greedy only), a `while_loop` that
        stops as soon as every caption has emitted EOS, like the reference's
        loop break (LSTM_DSA.py:186-188): trained captions end well before
        max_caption_len, so serving decode time tracks the actual caption
        length. Token output is identical; logprob entries after an event's
        EOS are zeros instead of junk (consumers mask by seq > 0 either way).
        """
        B, Ne = query.shape[:2]
        ref, value, shapes = self._prepare(reference, valid_ratios,
                                           temporal_shapes, memory,
                                           memory_mask, ref_prepared)

        if early_exit and greedy:
            Lc = self.max_caption_len

            def cond(mod, carry):
                t, _h, _c, _it, unfinished, _tk, _lp = carry
                return (t < Lc) & unfinished.any()

            def body(mod, carry):
                t, h, c, it, unfinished, toks, lps = carry
                (h, c), z = mod._step(it, (h, c), query, ref, value, shapes,
                                      deterministic)
                # f32 logsumexp even when z is bf16 (SCST/bf16-decode): the
                # cast fuses into the reduction — no f32 logits materialized
                lse = jax.scipy.special.logsumexp(
                    z.astype(jnp.float32), axis=-1)
                choice_lp = (jnp.max(z, axis=-1).astype(jnp.float32)
                             - lse).astype(lps.dtype)
                nt = jnp.argmax(z, axis=-1).astype(jnp.int32)
                unfinished = jnp.where(t == 0, nt > 0, unfinished & (nt > 0))
                nt = nt * unfinished.astype(nt.dtype)
                toks = jax.lax.dynamic_update_index_in_dim(toks, nt, t, 2)
                lps = jax.lax.dynamic_update_index_in_dim(
                    lps, choice_lp, t, 2)
                return (t + 1, h, c, nt, unfinished, toks, lps)

            init = (jnp.asarray(0, jnp.int32),
                    jnp.zeros((B, Ne, self.rnn_size), query.dtype),
                    jnp.zeros((B, Ne, self.rnn_size), query.dtype),
                    jnp.zeros((B, Ne), jnp.int32),              # BOS = 0
                    jnp.ones((B, Ne), bool),
                    jnp.zeros((B, Ne, Lc), jnp.int32),
                    jnp.zeros((B, Ne, Lc), jnp.float32))
            _, _, _, _, _, toks, lps = nn.while_loop(cond, body, self, init)
            return toks, lps

        if not self.scan_loops:
            carry = (jnp.zeros((B, Ne, self.rnn_size), query.dtype),
                     jnp.zeros((B, Ne, self.rnn_size), query.dtype))
            it = jnp.zeros((B, Ne), dtype=jnp.int32)            # BOS = 0
            unfinished = jnp.ones((B, Ne), dtype=bool)
            seq_toks, seq_lps = [], []
            for t in range(self.max_caption_len):
                carry, z = self._step(it, carry, query, ref, value, shapes,
                                      deterministic)
                # f32 accumulation for the chosen-token logprob even under
                # bf16 rollouts (casts fuse into the reductions/picks)
                lse = jax.scipy.special.logsumexp(
                    z.astype(jnp.float32), axis=-1)
                if greedy:
                    # argmax/logprob from raw logits: same result as
                    # log_softmax, without materializing the normalized
                    # (B,Ne,V) tensor every step
                    choice_lp = jnp.max(z, axis=-1).astype(jnp.float32) - lse
                    it = jnp.argmax(z, axis=-1).astype(jnp.int32)
                else:
                    rng = self.make_rng("sample")
                    # categorical is shift-invariant: logits/T samples the
                    # same distribution as logprobs/T
                    it = jax.random.categorical(rng, z / temperature
                                                ).astype(jnp.int32)
                    choice_lp = jnp.take_along_axis(
                        z, it[..., None],
                        axis=-1)[..., 0].astype(jnp.float32) - lse
                unfinished = (it > 0) if t == 0 else (unfinished & (it > 0))
                it = it * unfinished.astype(it.dtype)
                seq_toks.append(it)
                seq_lps.append(choice_lp)
            return jnp.stack(seq_toks, axis=2), jnp.stack(seq_lps, axis=2)

        def body(mod, carry, is_first):
            h, c, it, unfinished = carry
            (h, c), z = mod._step(it, (h, c), query, ref, value, shapes,
                                  deterministic)
            lse = jax.scipy.special.logsumexp(
                z.astype(jnp.float32), axis=-1)
            if greedy:
                choice_lp = jnp.max(z, axis=-1).astype(jnp.float32) - lse
                nt = jnp.argmax(z, axis=-1).astype(jnp.int32)
            else:
                rng = mod.make_rng("sample")
                nt = jax.random.categorical(rng, z / temperature
                                            ).astype(jnp.int32)
                choice_lp = jnp.take_along_axis(
                    z, nt[..., None],
                    axis=-1)[..., 0].astype(jnp.float32) - lse
            unfinished = jnp.where(is_first, nt > 0, unfinished & (nt > 0))
            nt = nt * unfinished.astype(nt.dtype)
            return (h, c, nt, unfinished), (nt, choice_lp)

        carry0 = (jnp.zeros((B, Ne, self.rnn_size), query.dtype),
                  jnp.zeros((B, Ne, self.rnn_size), query.dtype),
                  jnp.zeros((B, Ne), jnp.int32),                # BOS = 0
                  jnp.ones((B, Ne), bool))
        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True, "sample": True},
                       in_axes=0, out_axes=0, unroll=4)
        _, (toks, lps) = scan(self, carry0,
                              jnp.arange(self.max_caption_len) == 0)
        return jnp.moveaxis(toks, 0, 2), jnp.moveaxis(lps, 0, 2)


    def sample_beam(self, query, reference, memory, memory_mask,
                    temporal_shapes, valid_ratios, beam_size: int = 3,
                    deterministic: bool = True):
        """Beam-search decode (the reference exposes beam_size but only ever
        runs greedy; this is a full implementation). Returns the best beam:
        (seq (B,Ne,Lc), per-step chosen logprobs (B,Ne,Lc)).

        Finished beams (emitted token 0) are frozen: they may only continue
        with token 0 at zero added score.
        """
        W = beam_size
        B, Ne = query.shape[:2]
        ref, value, shapes = self._prepare(reference, valid_ratios,
                                           temporal_shapes, memory, memory_mask)
        # tile events x beams into the event axis for _step
        q_t = jnp.repeat(query, W, axis=1)                  # (B, Ne*W, C)
        ref_t = jnp.repeat(ref, W, axis=1)

        V = self.vocab_size + 1
        Lc = self.max_caption_len
        h = jnp.zeros((B, Ne * W, self.rnn_size), query.dtype)
        c = jnp.zeros((B, Ne * W, self.rnn_size), query.dtype)
        it = jnp.zeros((B, Ne * W), jnp.int32)
        scores = jnp.full((B, Ne, W), -1e9).at[:, :, 0].set(0.0)
        finished = jnp.zeros((B, Ne, W), bool)
        toks = jnp.zeros((B, Ne, W, Lc), jnp.int32)
        lps = jnp.zeros((B, Ne, W, Lc))

        for t in range(Lc):
            (h, c), z = self._step(it, (h, c), q_t, ref_t, value, shapes,
                                   deterministic)
            lp = _log_softmax_f32(z).reshape(B, Ne, W, V)
            # frozen beams: only token 0, zero added score
            frozen = jnp.full((V,), -1e9).at[0].set(0.0)
            lp = jnp.where(finished[..., None], frozen[None, None, None, :],
                           lp)
            cand = scores[..., None] + lp                   # (B, Ne, W, V)
            flat = cand.reshape(B, Ne, W * V)
            scores, top_idx = jax.lax.top_k(flat, W)        # (B, Ne, W)
            parent = top_idx // V
            token = (top_idx % V).astype(jnp.int32)
            step_lp = jnp.take_along_axis(
                lp.reshape(B, Ne, W * V), top_idx, axis=-1)

            def regather(x):
                return jnp.take_along_axis(x, parent[..., None], axis=2)

            toks = regather(toks)
            lps = regather(lps)
            toks = toks.at[:, :, :, t].set(token)
            lps = lps.at[:, :, :, t].set(step_lp)
            finished = jnp.take_along_axis(finished, parent, axis=2) | \
                (token == 0)
            # regather LSTM state along the tiled axis
            hw = h.reshape(B, Ne, W, -1)
            cw = c.reshape(B, Ne, W, -1)
            hw = jnp.take_along_axis(hw, parent[..., None], axis=2)
            cw = jnp.take_along_axis(cw, parent[..., None], axis=2)
            h = hw.reshape(B, Ne * W, -1)
            c = cw.reshape(B, Ne * W, -1)
            it = token.reshape(B, Ne * W)

        best = jnp.argmax(scores, axis=-1)                  # (B, Ne)
        best_toks = jnp.take_along_axis(
            toks, best[..., None, None], axis=2)[:, :, 0]
        best_lps = jnp.take_along_axis(
            lps, best[..., None, None], axis=2)[:, :, 0]
        # zero everything after the first EOS (token 0), like greedy
        emitted = jnp.cumsum((best_toks == 0).astype(jnp.int32), axis=-1)
        alive = (emitted - (best_toks == 0)) == 0
        return best_toks * alive, best_lps


class LightCaptioner(nn.Module):
    """'light' head: LSTM over [word emb ; event feature] (reference:
    CaptioningHead/LSTM.py). No deformable attention; the event query itself
    is the visual context."""
    vocab_size: int
    input_encoding_size: int
    rnn_size: int
    max_caption_len: int
    drop_prob: float = 0.5

    def setup(self):
        self.embed = nn.Embed(self.vocab_size + 1, self.input_encoding_size,
                              embedding_init=nn.initializers.uniform(scale=0.1))
        self.logit = nn.Dense(self.vocab_size + 1,
                              kernel_init=nn.initializers.uniform(scale=0.1))
        self.dropout = nn.Dropout(self.drop_prob)
        self.cell = LSTMCellNoBias(self.rnn_size)

    def _step_core(self, it, carry, ctx, deterministic):
        h, c = carry
        xt = self.embed(it)
        inp = jnp.concatenate([xt, ctx], axis=-1)
        (h, c), out = self.cell((h, c), inp)
        out = self.dropout(out, deterministic=deterministic)
        return (h, c), out

    def _step(self, it, carry, ctx, deterministic):
        carry, out = self._step_core(it, carry, ctx, deterministic)
        return carry, _log_softmax_f32(self.logit(out))

    def _tf_hidden_states(self, seq, ctx, deterministic):
        """Teacher-forced recurrence -> (B,Ne,T,R). Same input-side hoist as
        LSTMDSACaptioner: xt@W_x batched over all steps + ctx@W_c once; only
        the recurrent hh matmul stays on the serial chain (exact up to f32
        summation order — the cell Dense has no bias)."""
        B, Ne, Lc = seq.shape
        T = Lc - 1
        E = self.input_encoding_size
        Wih = self.cell.ih_matrix(E + ctx.shape[-1], ctx.dtype)
        z_x = self.embed(seq[:, :, :T]).reshape(B * Ne, T, E) @ Wih[:E]
        z_c = ctx @ Wih[E:]                                 # (B*Ne, 4R)
        h = jnp.zeros((B * Ne, self.rnn_size), ctx.dtype)
        c = jnp.zeros((B * Ne, self.rnn_size), ctx.dtype)
        hs = []
        for t in range(T):
            (h, c), out = self.cell.gates((h, c), z_x[:, t] + z_c)
            out = self.dropout(out, deterministic=deterministic)
            hs.append(out.reshape(B, Ne, -1))
        return jnp.stack(hs, axis=2)

    def __call__(self, query, reference, memory, memory_mask, temporal_shapes,
                 valid_ratios, seq, deterministic: bool = True):
        B, Ne = seq.shape[:2]
        ctx = query.reshape(B * Ne, -1)
        # teacher forcing never feeds logits back into the recurrence —
        # hoist the vocab projection + log-softmax out of the token chain
        # (one batched matmul over all steps; same trick as LSTMDSACaptioner)
        hs = self._tf_hidden_states(seq, ctx, deterministic)
        return _log_softmax_f32(self.logit(hs))

    def teacher_forced_nll(self, query, reference, memory, memory_mask,
                           temporal_shapes, valid_ratios, seq, seq_mask,
                           deterministic: bool = True):
        """Fused per-event NLL (B,Ne) — see LSTMDSACaptioner's docstring."""
        B, Ne = seq.shape[:2]
        ctx = query.reshape(B * Ne, -1)
        hs = self._tf_hidden_states(seq, ctx, deterministic)
        z = self.logit(hs).astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(z, axis=-1)
        picked = jnp.take_along_axis(z, seq[:, :, 1:, None],
                                     axis=-1)[..., 0]
        m = seq_mask[:, :, 1:].astype(jnp.float32)
        return -((picked - lse) * m).sum(-1) / (m.sum(-1) + 1e-6)

    def sample(self, query, reference, memory, memory_mask, temporal_shapes,
               valid_ratios, greedy: bool = True, temperature: float = 1.0,
               deterministic: bool = True, early_exit: bool = False):
        B, Ne = query.shape[:2]
        ctx = query.reshape(B * Ne, -1)

        if early_exit and greedy:
            # while_loop greedy decode that stops once every caption has
            # emitted EOS — same early-exit semantics as the LSTM-DSA head
            # (the reference light head shares LSTM.py's unfinished break)
            Lc = self.max_caption_len

            def cond(mod, carry):
                t, _h, _c, _it, unfinished, _tk, _lp = carry
                return (t < Lc) & unfinished.any()

            def body(mod, carry):
                t, h, c, it, unfinished, toks, lps = carry
                (h, c), lp = mod._step(it, (h, c), ctx, deterministic)
                choice_lp = jnp.max(lp, axis=-1)
                nt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
                unfinished = jnp.where(t == 0, nt > 0, unfinished & (nt > 0))
                nt = nt * unfinished.astype(nt.dtype)
                toks = jax.lax.dynamic_update_index_in_dim(toks, nt, t, 1)
                lps = jax.lax.dynamic_update_index_in_dim(
                    lps, choice_lp, t, 1)
                return (t + 1, h, c, nt, unfinished, toks, lps)

            init = (jnp.asarray(0, jnp.int32),
                    jnp.zeros((B * Ne, self.rnn_size), query.dtype),
                    jnp.zeros((B * Ne, self.rnn_size), query.dtype),
                    jnp.zeros((B * Ne,), jnp.int32),            # BOS = 0
                    jnp.ones((B * Ne,), bool),
                    jnp.zeros((B * Ne, Lc), jnp.int32),
                    jnp.zeros((B * Ne, Lc), jnp.float32))
            _, _, _, _, _, toks, lps = nn.while_loop(cond, body, self, init)
            return toks.reshape(B, Ne, Lc), lps.reshape(B, Ne, Lc)

        carry = (jnp.zeros((B * Ne, self.rnn_size), query.dtype),
                 jnp.zeros((B * Ne, self.rnn_size), query.dtype))
        it = jnp.zeros((B * Ne,), dtype=jnp.int32)
        unfinished = jnp.ones((B * Ne,), dtype=bool)
        seq_toks, seq_lps = [], []
        for t in range(self.max_caption_len):
            carry, lp = self._step(it, carry, ctx, deterministic)
            if greedy:
                choice_lp = jnp.max(lp, axis=-1)
                it = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            else:
                rng = self.make_rng("sample")
                it = jax.random.categorical(rng, lp / temperature).astype(jnp.int32)
                choice_lp = jnp.take_along_axis(lp, it[..., None], axis=-1)[..., 0]
            unfinished = (it > 0) if t == 0 else (unfinished & (it > 0))
            it = it * unfinished.astype(it.dtype)
            seq_toks.append(it.reshape(B, Ne))
            seq_lps.append(choice_lp.reshape(B, Ne))
        return jnp.stack(seq_toks, axis=2), jnp.stack(seq_lps, axis=2)


def _sine_table(max_len: int, dim: int) -> jnp.ndarray:
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                  * -(math.log(10000.0) / dim))
    tab = jnp.zeros((max_len, dim))
    tab = tab.at[:, 0::2].set(jnp.sin(pos * div))
    tab = tab.at[:, 1::2].set(jnp.cos(pos * div))
    return tab


class TransformerDSACaptioner(nn.Module):
    """'transformer' head: causal transformer over caption tokens whose
    cross-attention is deformable sampling around the event's reference
    point (reference: CaptioningHead/Transformer_DSA.py).

    TPU redesign: the reference tiles the whole video memory per event
    (Transformer_DSA.py:103-105, an O(Ne * S) copy); here tokens of all
    events are flattened into one (B, Ne*L) query axis against the shared
    (B, S) memory — no memory duplication.
    """
    vocab_size: int
    input_encoding_size: int
    d_model: int
    num_layers: int
    n_levels: int
    n_heads: int
    n_points: int
    max_caption_len: int
    drop_prob: float = 0.5

    def setup(self):
        from gvl_tpu.models.gpt_captioner import CachedSelfAttention
        self.embed = nn.Embed(self.vocab_size + 1, self.input_encoding_size)
        self.logits = nn.Dense(self.vocab_size + 1)
        self.lm_dropout = nn.Dropout(self.drop_prob)
        self.res_dropout = nn.Dropout(self.drop_prob)
        # parameter-layout-identical to nn.MultiHeadDotProductAttention
        # (query/key/value/out DenseGenerals), plus a functional KV cache
        # for the O(L) single-token decode in sample()
        self.self_attns = [CachedSelfAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            dropout_rate=self.drop_prob, name=f"self_attn_{i}")
            for i in range(self.num_layers)]
        self.dim_projects = [nn.Dense(self.d_model, name=f"dim_project_{i}")
                             for i in range(self.num_layers)]
        from gvl_tpu.models.layers import MSDeformAttn1D
        self.cross_attns = [MSDeformAttn1D(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            impl="ref", name=f"cross_attn_{i}")
            for i in range(self.num_layers)]
        self.norms1 = [nn.LayerNorm(name=f"norm1_{i}")
                       for i in range(self.num_layers)]
        self.norms2 = [nn.LayerNorm(name=f"norm2_{i}")
                       for i in range(self.num_layers)]
        self.norms3 = [nn.LayerNorm(name=f"norm3_{i}")
                       for i in range(self.num_layers)]
        self.ffn1 = [nn.Dense(4 * self.d_model, name=f"ffn1_{i}")
                     for i in range(self.num_layers)]
        self.ffn2 = [nn.Dense(self.d_model, name=f"ffn2_{i}")
                     for i in range(self.num_layers)]

    def _prepare_ref(self, reference, valid_ratios, temporal_shapes,
                     memory, memory_mask):
        shapes = tuple(int(t) for t in temporal_shapes[:self.n_levels])
        total = sum(shapes)
        memory = memory[:, :total]
        memory_mask = memory_mask[:, :total] if memory_mask is not None else None
        vr = valid_ratios[:, :self.n_levels]
        if reference.shape[-1] == 2:
            ref = reference[:, :, None, :] * jnp.stack([vr, vr], -1)[:, None]
        else:
            ref = reference[:, :, None, :] * vr[:, None, :, None]
        return ref, memory, memory_mask, shapes

    def _forward_logprobs(self, query, ref, memory, memory_mask, shapes, seq,
                          deterministic):
        """seq (B,Ne,L) -> logprobs (B,Ne,L,V+1) (position t predicts t+1)."""
        B, Ne, L = seq.shape
        x = self.embed(seq) + _sine_table(
            self.max_caption_len + 2, self.input_encoding_size)[None, None, :L]
        x = x.reshape(B, Ne * L, -1)
        causal = jnp.tril(jnp.ones((L, L), bool))
        # block-diagonal over events, causal within an event
        eye = jnp.eye(Ne, dtype=bool)
        mask = (eye[:, None, :, None] & causal[None, :, None, :]).reshape(
            Ne * L, Ne * L)[None, None]
        ref_tok = jnp.repeat(ref, L, axis=1)          # (B, Ne*L, lvl, 1|2)
        q_tok = jnp.repeat(query, L, axis=1)
        for i in range(self.num_layers):
            h = self.self_attns[i](x, mask=mask,
                                   deterministic=deterministic)
            x = self.norms1[i](x + self.res_dropout(
                h, deterministic=deterministic))
            joint = self.dim_projects[i](jnp.concatenate([x, q_tok], -1))
            h = self.cross_attns[i](joint, ref_tok, memory, memory_mask,
                                    shapes)
            x = self.norms2[i](x + self.res_dropout(
                h, deterministic=deterministic))
            h = self.ffn2[i](nn.relu(self.ffn1[i](x)))
            x = self.norms3[i](x + h)
        lp = _log_softmax_f32(
            self.logits(self.lm_dropout(x, deterministic=deterministic)))
        return lp.reshape(B, Ne, L, -1)

    def __call__(self, query, reference, memory, memory_mask, temporal_shapes,
                 valid_ratios, seq, deterministic: bool = True):
        ref, memory, memory_mask, shapes = self._prepare_ref(
            reference, valid_ratios, temporal_shapes, memory, memory_mask)
        lp = self._forward_logprobs(query, ref, memory, memory_mask, shapes,
                                    seq, deterministic)
        return lp[:, :, :-1]                         # align: predict t+1

    def _cached_step(self, it, t, query, ref, memory, memory_mask, shapes,
                     caches, deterministic):
        """One KV-cached decode step for all (B, Ne) events: token `it` at
        position t (t may be traced). caches: per-layer (k, v), each
        (B*Ne, Lc, H, Dh) — self-attention is block-diagonal over events,
        so events flatten into the batch axis. Returns (logprobs (B,Ne,V+1),
        caches')."""
        B, Ne = it.shape
        x = self.embed(it) + _sine_table(
            self.max_caption_len + 2, self.input_encoding_size)[t][None, None]
        new_caches = []
        for i in range(self.num_layers):
            a, ck, cv = self.self_attns[i].step(
                x.reshape(B * Ne, 1, -1), caches[i][0], caches[i][1], t)
            new_caches.append((ck, cv))
            x = self.norms1[i](x + self.res_dropout(
                a.reshape(B, Ne, -1), deterministic=deterministic))
            joint = self.dim_projects[i](jnp.concatenate([x, query], -1))
            h = self.cross_attns[i](joint, ref, memory, memory_mask, shapes)
            x = self.norms2[i](x + self.res_dropout(
                h, deterministic=deterministic))
            h = self.ffn2[i](nn.relu(self.ffn1[i](x)))
            x = self.norms3[i](x + h)
        lp = _log_softmax_f32(self.logits(
            self.lm_dropout(x, deterministic=deterministic)))
        return lp, tuple(new_caches)

    def sample(self, query, reference, memory, memory_mask, temporal_shapes,
               valid_ratios, greedy: bool = True, temperature: float = 1.0,
               deterministic: bool = True, use_cache: bool = True,
               early_exit: bool = False):
        """Greedy decode. The reference re-runs the full forward per step
        (Transformer_DSA.py:216-254, O(L^2) self-attention over L distinct
        shapes); use_cache (default) replaces that with per-layer KV caches —
        one fixed compiled step shape, O(L) attention, same tokens (the
        re-forward loop stays as the in-tree numerical oracle,
        use_cache=False). early_exit lowers the cached loop to a while_loop
        that stops once every caption has emitted EOS."""
        B, Ne = query.shape[:2]
        ref, memory, memory_mask, shapes = self._prepare_ref(
            reference, valid_ratios, temporal_shapes, memory, memory_mask)
        Lc = self.max_caption_len

        if use_cache:
            H, Dh = self.n_heads, self.d_model // self.n_heads
            caches = tuple(
                (jnp.zeros((B * Ne, Lc, H, Dh)),
                 jnp.zeros((B * Ne, Lc, H, Dh)))
                for _ in range(self.num_layers))
            if early_exit:
                def cond(mod, carry):
                    t, _it, unfinished, *_ = carry
                    return (t < Lc) & unfinished.any()

                def body(mod, carry):
                    t, it, unfinished, caches, toks, lps = carry
                    lp, caches = mod._cached_step(
                        it, t, query, ref, memory, memory_mask, shapes,
                        caches, deterministic)
                    choice_lp = jnp.max(lp, axis=-1)
                    nt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
                    unfinished = jnp.where(t == 0, nt > 0,
                                           unfinished & (nt > 0))
                    nt = nt * unfinished.astype(nt.dtype)
                    toks = jax.lax.dynamic_update_index_in_dim(toks, nt, t, 2)
                    lps = jax.lax.dynamic_update_index_in_dim(
                        lps, choice_lp, t, 2)
                    return (t + 1, nt, unfinished, caches, toks, lps)

                init = (jnp.asarray(0, jnp.int32),
                        jnp.zeros((B, Ne), jnp.int32),      # BOS = 0
                        jnp.ones((B, Ne), bool), caches,
                        jnp.zeros((B, Ne, Lc), jnp.int32),
                        jnp.zeros((B, Ne, Lc), jnp.float32))
                _, _, _, _, toks, lps = nn.while_loop(cond, body, self, init)
                return toks, lps

            it = jnp.zeros((B, Ne), jnp.int32)              # BOS = 0
            unfinished = jnp.ones((B, Ne), bool)
            seq_toks, seq_lps = [], []
            for t in range(Lc):
                lp, caches = self._cached_step(it, t, query, ref, memory,
                                               memory_mask, shapes, caches,
                                               deterministic)
                choice_lp = jnp.max(lp, axis=-1)
                it = jnp.argmax(lp, axis=-1).astype(jnp.int32)
                unfinished = (it > 0) if t == 0 else (unfinished & (it > 0))
                it = it * unfinished.astype(it.dtype)
                seq_toks.append(it)
                seq_lps.append(choice_lp)
            return jnp.stack(seq_toks, 2), jnp.stack(seq_lps, 2)

        # re-forward oracle (the reference's loop shape)
        seq = jnp.zeros((B, Ne, Lc + 1), jnp.int32)   # position 0 = BOS
        lps = jnp.zeros((B, Ne, Lc))
        unfinished = jnp.ones((B, Ne), bool)
        for t in range(Lc):
            lp_all = self._forward_logprobs(query, ref, memory, memory_mask,
                                            shapes, seq[:, :, :t + 1],
                                            deterministic)
            lp = lp_all[:, :, t]
            choice_lp = jnp.max(lp, axis=-1)
            it = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            unfinished = (it > 0) if t == 0 else (unfinished & (it > 0))
            it = it * unfinished.astype(it.dtype)
            seq = seq.at[:, :, t + 1].set(it)
            lps = lps.at[:, :, t].set(choice_lp)
        return seq[:, :, 1:], lps


class PuppetCaptioner(nn.Module):
    """'none': zero outputs with the right shapes so localization-only
    configs keep a uniform interface (reference: Puppet.py)."""
    vocab_size: int
    max_caption_len: int

    def __call__(self, query, reference, memory, memory_mask, temporal_shapes,
                 valid_ratios, seq, deterministic: bool = True):
        B, Ne, Lc = seq.shape
        return jnp.zeros((B, Ne, Lc - 1, self.vocab_size + 1))

    def sample(self, query, reference, memory, memory_mask, temporal_shapes,
               valid_ratios, greedy: bool = True, temperature: float = 1.0,
               deterministic: bool = True):
        B, Ne = query.shape[:2]
        z = jnp.zeros((B, Ne, self.max_caption_len))
        return z.astype(jnp.int32), z
