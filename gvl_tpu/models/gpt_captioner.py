"""GPT-2 ClipCap-style caption head.

Behavioral spec: reference pdvc/CaptioningHead/GPT.py (ClipCaptionModel) —
an MLP (or small transformer) maps the event feature to `prefix_length`
GPT-2 token embeddings; GPT-2 computes the LM loss with the prefix positions
labeled -100; greedy sampling stops at '.'.

Offline note: with no HF weight cache the GPT-2 backbone is built from a
(small) config with random weights and a hash tokenizer — structurally
complete, semantically untrained; from_pretrained is attempted first.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class GPT2Spec:
    vocab_size: int = 50257
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    prefix_length: int = 10
    prefix_size: int = 512
    mapping_type: str = "mlp"           # 'mlp' | 'transformer'
    prefix_num_mapping_layer: int = 8
    stop_token_id: int = 13             # '.' for the real gpt2 tokenizer
    n_positions: int = 1024


class PrefixMapper(nn.Module):
    """Event feature -> prefix_length GPT embeddings (reference GPT.py:
    MLP variant uses a tanh MLP; TransformerMapper uses 8 self-attn layers
    over [projected feature ; learned constants])."""
    spec: GPT2Spec

    @nn.compact
    def __call__(self, x):
        s = self.spec
        if s.mapping_type == "mlp":
            # hidden = (E*P)//2, matching the reference ClipCap MLP sizes
            # (GPT.py:239-240: (prefix_size, E*P//2, E*P) with tanh)
            out_dim = s.prefix_length * s.n_embd
            h = nn.tanh(nn.Dense(out_dim // 2, name="fc1")(x))
            h = nn.Dense(out_dim, name="fc2")(h)
            return h.reshape(x.shape[0], s.prefix_length, s.n_embd)
        # transformer mapper
        h = nn.Dense(s.prefix_length * s.n_embd)(x).reshape(
            x.shape[0], s.prefix_length, s.n_embd)
        const = self.param("prefix_const", nn.initializers.normal(1.0),
                           (s.prefix_length, s.n_embd))
        z = jnp.concatenate(
            [h, jnp.broadcast_to(const[None], h.shape)], axis=1)
        for i in range(s.prefix_num_mapping_layer):
            a = nn.MultiHeadDotProductAttention(
                num_heads=8, qkv_features=s.n_embd, name=f"attn_{i}")(z, z, z)
            z = nn.LayerNorm(name=f"ln1_{i}")(z + a)
            f = nn.Dense(s.n_embd, name=f"ffn2_{i}")(
                nn.relu(nn.Dense(2 * s.n_embd, name=f"ffn1_{i}")(z)))
            z = nn.LayerNorm(name=f"ln2_{i}")(z + f)
        return z[:, s.prefix_length:]


class CachedSelfAttention(nn.Module):
    """Self-attention with the exact parameter layout of
    nn.MultiHeadDotProductAttention (query/key/value DenseGeneral into
    (H, Dh); 'out' back to E) plus an explicit FUNCTIONAL KV cache for
    single-token decode: the cache is carried through the sampling loop as
    plain arrays (jit/while_loop-friendly, fixed shapes) instead of flax
    'cache' variables, which require a module-attribute `decode` flag and
    one-token-at-a-time priming. Full-sequence mode is bit-identical to
    nn.MultiHeadDotProductAttention (same projections, same
    nn.dot_product_attention)."""
    num_heads: int
    qkv_features: int
    dropout_rate: float = 0.0   # attention-weight dropout (used by the
                                # transformer-DSA caption head's train path)

    def setup(self):
        H = self.num_heads
        Dh = self.qkv_features // H
        self.query = nn.DenseGeneral(features=(H, Dh), name="query")
        self.key = nn.DenseGeneral(features=(H, Dh), name="key")
        self.value = nn.DenseGeneral(features=(H, Dh), name="value")
        self.out = nn.DenseGeneral(features=self.qkv_features,
                                   axis=(-2, -1), name="out")

    def __call__(self, x, mask=None, return_kv: bool = False,
                 deterministic: bool = True):
        q, k, v = self.query(x), self.key(x), self.value(x)
        if self.dropout_rate > 0.0 and not deterministic:
            ctx = nn.dot_product_attention(
                q, k, v, mask=mask, dropout_rate=self.dropout_rate,
                dropout_rng=self.make_rng("dropout"), deterministic=False)
        else:
            ctx = nn.dot_product_attention(q, k, v, mask=mask)
        o = self.out(ctx)
        return (o, k, v) if return_kv else o

    def step(self, x_t, cache_k, cache_v, index):
        """One cached decode step. x_t (N,1,E); cache_{k,v} (N,Lmax,H,Dh);
        index = #tokens already cached (= this token's position). Returns
        (out (N,1,E), cache_k', cache_v')."""
        q = self.query(x_t)
        k_t, v_t = self.key(x_t), self.value(x_t)
        cache_k = jax.lax.dynamic_update_slice(cache_k, k_t, (0, index, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, v_t, (0, index, 0, 0))
        Lmax = cache_k.shape[1]
        mask = (jnp.arange(Lmax) <= index)[None, None, None, :]
        ctx = nn.dot_product_attention(q, cache_k, cache_v, mask=mask)
        return self.out(ctx), cache_k, cache_v


class MiniGPT2(nn.Module):
    """GPT-2 decoder with the HF parameter layout semantics (pre-LN blocks,
    fused qkv projection, gelu MLP, learned positions, tied LM head) —
    implemented natively because HF's Flax module has no inputs_embeds path;
    pretrained HF weights map 1:1 onto these submodules."""
    spec: GPT2Spec

    def setup(self):
        s = self.spec
        self.wte = nn.Embed(s.vocab_size, s.n_embd, name="wte")
        self.wpe = nn.Embed(s.n_positions, s.n_embd, name="wpe")
        self.blocks_attn = [CachedSelfAttention(
            num_heads=s.n_head, qkv_features=s.n_embd, name=f"attn_{i}")
            for i in range(s.n_layer)]
        # GPT-2 layer_norm_epsilon is 1e-5 (flax default 1e-6 shifts logits
        # by ~3e-3 against pretrained weights)
        self.ln1 = [nn.LayerNorm(epsilon=1e-5, name=f"ln1_{i}")
                    for i in range(s.n_layer)]
        self.ln2 = [nn.LayerNorm(epsilon=1e-5, name=f"ln2_{i}")
                    for i in range(s.n_layer)]
        self.fc = [nn.Dense(4 * s.n_embd, name=f"fc_{i}")
                   for i in range(s.n_layer)]
        self.proj = [nn.Dense(s.n_embd, name=f"proj_{i}")
                     for i in range(s.n_layer)]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, name="ln_f")

    def __call__(self, inputs_embeds, attention_mask,
                 deterministic: bool = True):
        N, L, _ = inputs_embeds.shape
        x = inputs_embeds + self.wpe(jnp.arange(L))[None]
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        mask = causal & attention_mask[:, None, None, :].astype(bool)
        for i in range(self.spec.n_layer):
            h = self.ln1[i](x)
            x = x + self.blocks_attn[i](h, mask=mask)
            h = self.ln2[i](x)
            x = x + self.proj[i](nn.gelu(self.fc[i](h)))
        x = self.ln_f(x)
        return x @ self.wte.embedding.T                   # tied logits

    def prime(self, inputs_embeds, max_length: int):
        """Full forward over the (dense) prefix that ALSO returns per-layer
        KV caches padded to max_length, for cached greedy decode. Returns
        (logits (N,P,V), caches: list of (k, v) each (N,max_length,H,Dh))."""
        N, P, _ = inputs_embeds.shape
        x = inputs_embeds + self.wpe(jnp.arange(P))[None]
        causal = jnp.tril(jnp.ones((P, P), bool))[None, None]
        caches = []
        for i in range(self.spec.n_layer):
            h = self.ln1[i](x)
            a, k, v = self.blocks_attn[i](h, mask=causal, return_kv=True)
            pad = [(0, 0), (0, max_length - P), (0, 0), (0, 0)]
            caches.append((jnp.pad(k, pad), jnp.pad(v, pad)))
            x = x + a
            h = self.ln2[i](x)
            x = x + self.proj[i](nn.gelu(self.fc[i](h)))
        x = self.ln_f(x)
        return x @ self.wte.embedding.T, caches

    def step(self, x_t, pos_index, caches):
        """One cached decode step: x_t (N,1,E) token embedding, pos_index =
        its position (= #tokens already cached). Returns (logits (N,V),
        caches')."""
        x = x_t + self.wpe(jnp.asarray(pos_index, jnp.int32))[None, None]
        new_caches = []
        for i in range(self.spec.n_layer):
            h = self.ln1[i](x)
            a, ck, cv = self.blocks_attn[i].step(h, caches[i][0],
                                                 caches[i][1], pos_index)
            new_caches.append((ck, cv))
            x = x + a
            h = self.ln2[i](x)
            x = x + self.proj[i](nn.gelu(self.fc[i](h)))
        x = self.ln_f(x)
        return (x @ self.wte.embedding.T)[:, 0], new_caches


class GPT2Captioner(nn.Module):
    """Prefix + GPT-2 LM. __call__ returns (per_pair_loss, logits);
    sample() decodes greedily with stop-token masking."""
    spec: GPT2Spec

    def setup(self):
        self.gpt = MiniGPT2(self.spec)
        self.clip_project = PrefixMapper(self.spec)

    def _embed_tokens(self, tokens):
        return self.gpt.wte(tokens.astype("i4"))

    def __call__(self, prefix, tokens, token_mask, deterministic: bool = True):
        """prefix (N, prefix_size); tokens (N, Lg) int; token_mask (N, Lg).
        Returns (loss_per_pair (N,), logits (N, Lg, V))."""
        s = self.spec
        N, Lg = tokens.shape
        prefix_emb = self.clip_project(prefix)                  # (N, P, E)
        tok_emb = self._embed_tokens(tokens)
        x = jnp.concatenate([prefix_emb, tok_emb], axis=1)      # (N, P+Lg, E)
        full_mask = jnp.concatenate(
            [jnp.ones((N, s.prefix_length), token_mask.dtype), token_mask], 1)
        logits = self.gpt(x, full_mask, deterministic)          # (N, P+Lg, V)
        # positions P-1 .. P+Lg-2 predict tokens 0..Lg-1 (prefix labeled -100
        # in the reference = excluded here by slicing)
        pred = logits[:, s.prefix_length - 1:-1]
        lp = jax.nn.log_softmax(pred, -1)
        picked = jnp.take_along_axis(lp, tokens[..., None].astype(jnp.int32),
                                     -1)[..., 0]
        m = token_mask.astype(lp.dtype)
        loss = -(picked * m).sum(-1) / jnp.maximum(m.sum(-1), 1.0)
        return loss, pred

    def sample(self, prefix, entry_length: int = 30,
               deterministic: bool = True, use_cache: bool = True,
               early_exit: bool = False):
        """Greedy decode. Returns (tokens (N, L), probs (N, L), mask (N, L));
        mask goes False after the stop token (reference GPT.py:189-226).

        use_cache (default): one full forward primes per-layer KV caches for
        the prefix, then each token is a single cached attention step —
        O(L) attention instead of the reference's O(L^2) full re-forward per
        token, and ONE compiled step shape instead of entry_length growing
        ones. use_cache=False keeps the re-forward loop as the in-tree
        numerical oracle (tests assert both paths emit identical tokens)."""
        s = self.spec
        N = prefix.shape[0]
        prefix_emb = self.clip_project(prefix)
        tokens = jnp.zeros((N, entry_length), jnp.int32)
        probs = jnp.zeros((N, entry_length))
        alive = jnp.ones((N,), bool)
        masks = []

        if use_cache and early_exit:
            # while_loop decode: stops once every caption has hit the stop
            # token (the reference generator's break) — natural here because
            # every cached step has one fixed compiled shape
            logits_p, caches = self.gpt.prime(
                prefix_emb, s.prefix_length + entry_length)

            def cond(mod, carry):
                t, _lg, alive, *_ = carry
                return (t < entry_length) & ((t == 0) | alive.any())

            def body(mod, carry):
                t, logits, alive, toks, prbs, msks, cch = carry
                nt = jnp.argmax(logits, -1).astype(jnp.int32)
                p = jax.nn.softmax(logits, -1).max(-1)
                alive = jnp.where(t == 0, nt != s.stop_token_id,
                                  alive & (nt != s.stop_token_id))
                toks = jax.lax.dynamic_update_index_in_dim(toks, nt, t, 1)
                prbs = jax.lax.dynamic_update_index_in_dim(prbs, p, t, 1)
                msks = jax.lax.dynamic_update_index_in_dim(msks, alive, t, 1)
                logits, cch = mod.gpt.step(mod._embed_tokens(nt[:, None]),
                                           s.prefix_length + t, cch)
                return (t + 1, logits, alive, toks, prbs, msks, cch)

            init = (jnp.asarray(0, jnp.int32), logits_p[:, -1],
                    jnp.ones((N,), bool), tokens, probs,
                    jnp.zeros((N, entry_length), bool), caches)
            _, _, _, tokens, probs, masks_b, _ = nn.while_loop(
                cond, body, self, init)
            return tokens, probs, masks_b

        if use_cache:
            logits_p, caches = self.gpt.prime(
                prefix_emb, s.prefix_length + entry_length)
            logits = logits_p[:, -1]
            for t in range(entry_length):
                nt = jnp.argmax(logits, -1).astype(jnp.int32)
                p = jax.nn.softmax(logits, -1).max(-1)
                alive = alive & (nt != s.stop_token_id) if t > 0 else \
                    (nt != s.stop_token_id)
                masks.append(alive)
                tokens = tokens.at[:, t].set(nt)
                probs = probs.at[:, t].set(p)
                if t < entry_length - 1:
                    logits, caches = self.gpt.step(
                        self._embed_tokens(nt[:, None]),
                        s.prefix_length + t, caches)
            return tokens, probs, jnp.stack(masks, 1)

        x = prefix_emb
        for t in range(entry_length):
            L = s.prefix_length + t
            logits = self.gpt(x, jnp.ones((N, L)), deterministic)[:, -1]
            nt = jnp.argmax(logits, -1).astype(jnp.int32)
            p = jax.nn.softmax(logits, -1).max(-1)
            alive = alive & (nt != s.stop_token_id) if t > 0 else \
                (nt != s.stop_token_id)
            masks.append(alive)
            tokens = tokens.at[:, t].set(nt)
            probs = probs.at[:, t].set(p)
            x = jnp.concatenate([x, self._embed_tokens(nt[:, None])], axis=1)
        return tokens, probs, jnp.stack(masks, 1)


def load_gpt2_spec(cfg) -> Tuple[GPT2Spec, Optional[object]]:
    """Try the real gpt2 tokenizer/config; fall back to a small random spec
    (see module docstring). 'offline' text-encoder mode skips the HF lookup
    entirely — on a no-network host from_pretrained stalls ~1 min in
    connection retries per call before raising."""
    if str(getattr(cfg, "load_pretrained_language_model_from_config", "")
            ) == "offline":
        spec = GPT2Spec(vocab_size=1000, n_embd=128, n_layer=2, n_head=4,
                        prefix_length=cfg.prefix_length,
                        prefix_size=cfg.prefix_size,
                        prefix_num_mapping_layer=2, stop_token_id=13)
        return spec, None
    try:
        from transformers import AutoTokenizer, GPT2Config
        tok = AutoTokenizer.from_pretrained(cfg.gpt_model,
                                            cache_dir=cfg.huggingface_cache_dir)
        gcfg = GPT2Config.from_pretrained(cfg.gpt_model)
        spec = GPT2Spec(vocab_size=gcfg.vocab_size, n_embd=gcfg.n_embd,
                        n_layer=gcfg.n_layer, n_head=gcfg.n_head,
                        n_positions=gcfg.n_positions,
                        prefix_length=cfg.prefix_length,
                        prefix_size=cfg.prefix_size,
                        prefix_num_mapping_layer=cfg.prefix_num_mapping_layer,
                        stop_token_id=tok.encode(".")[0])
        return spec, tok
    except Exception:
        spec = GPT2Spec(vocab_size=1000, n_embd=128, n_layer=2, n_head=4,
                        prefix_length=cfg.prefix_length,
                        prefix_size=cfg.prefix_size,
                        prefix_num_mapping_layer=2, stop_token_id=13)
        return spec, None
