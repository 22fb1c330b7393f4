"""Pretrained text encoder wrapper (HF Flax RoBERTa by default).

Behavioral spec: reference pdvc/pdvc.py:1184-1191 loads
`AutoModel.from_pretrained(cfg.pretrained_language_model)` (roberta-base) and
tokenizes host-side with the matching AutoTokenizer (train.py:393-399).

This environment may have no HF weight cache and no network; in that case we
fall back to a randomly-initialized (smaller) RoBERTa built from config plus
a deterministic hash tokenizer — enough for tests and smoke training. The
`load_pretrained_language_model_from_config` cfg flag forces that path
explicitly (same flag as the reference, opts.py:203).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np


@dataclasses.dataclass
class TextEncoderBundle:
    apply_fn: Callable            # (params, ids (N,L), mask (N,L)) -> (N,L,H)
    params: dict
    hidden_size: int
    tokenize: Callable            # (list[list[str]], G, maxlen) -> ids, mask
    pretrained: bool


class HashTokenizer:
    """Deterministic whitespace+hash tokenizer (offline fallback).
    RoBERTa-style special ids: bos=0, pad=1, eos=2; words hash into
    [3, vocab)."""

    def __init__(self, vocab_size: int = 5000):
        self.vocab_size = vocab_size

    def __call__(self, sents: List[str], max_len: int):
        import zlib
        ids = np.ones((len(sents), max_len), np.int32)          # pad=1
        mask = np.zeros((len(sents), max_len), np.int32)
        for i, s in enumerate(sents):
            toks = [0] + [3 + (zlib.crc32(w.encode()) % (self.vocab_size - 3))
                          for w in s.lower().split()][: max_len - 2] + [2]
            ids[i, :len(toks)] = toks
            mask[i, :len(toks)] = 1
        return ids, mask


def _batch_tokenize(tok_fn, raw_per_video: List[List[str]], G: int,
                    max_len: int):
    """Tokenize per-video sentence lists into padded (B, G, L) arrays."""
    B = len(raw_per_video)
    flat = []
    for sents in raw_per_video:
        sents = list(sents[:G]) + [""] * (G - len(sents[:G]))
        flat.extend(sents)
    ids, mask = tok_fn(flat, max_len)
    return ids.reshape(B, G, -1), mask.reshape(B, G, -1)


def load_text_encoder(cfg) -> Optional[TextEncoderBundle]:
    if not cfg.enable_contrastive:
        return None

    from transformers import RobertaConfig, FlaxRobertaModel

    model = None
    tokenizer = None
    pretrained = False
    if not cfg.get("load_pretrained_language_model_from_config"):
        try:
            from transformers import AutoTokenizer, FlaxAutoModel
            name = cfg.pretrained_language_model
            tokenizer = AutoTokenizer.from_pretrained(
                name, cache_dir=cfg.huggingface_cache_dir,
                local_files_only=False)
            try:
                model = FlaxAutoModel.from_pretrained(
                    name, cache_dir=cfg.huggingface_cache_dir)
            except (OSError, EnvironmentError, ValueError):
                # torch-only checkpoint (the reference ecosystem ships
                # PyTorch weights): convert on load
                model = FlaxAutoModel.from_pretrained(
                    name, cache_dir=cfg.huggingface_cache_dir, from_pt=True)
            pretrained = True
        except Exception:
            model, tokenizer = None, None

    if model is None:
        # offline fallback: small random RoBERTa + hash tokenizer
        hidden = int(cfg.get("offline_text_encoder_hidden", 256))
        layers = int(cfg.get("offline_text_encoder_layers", 2))
        rcfg = RobertaConfig(
            vocab_size=5000, hidden_size=hidden, num_hidden_layers=layers,
            num_attention_heads=max(hidden // 64, 1),
            intermediate_size=hidden * 4, max_position_embeddings=514,
            type_vocab_size=1)
        model = FlaxRobertaModel(rcfg, seed=cfg.seed)
        hash_tok = HashTokenizer(5000)

        def tok_fn(sents, max_len):
            return hash_tok(sents, max_len)
    else:
        def tok_fn(sents, max_len):
            out = tokenizer(sents, return_tensors="np", truncation=True,
                            padding="max_length", max_length=max_len)
            return (out["input_ids"].astype(np.int32),
                    out["attention_mask"].astype(np.int32))

    def apply_fn(params, ids, mask):
        # the FlaxPreTrainedModel wrapper fills architecture-specific
        # defaults (token_type_ids/position_ids) that a raw module.apply
        # would require — works for RoBERTa, BERT, and anything FlaxAutoModel
        # resolves; jit-traceable
        out = model(input_ids=ids, attention_mask=mask, params=params)
        return out.last_hidden_state

    def tokenize(raw_per_video, G, max_len):
        return _batch_tokenize(tok_fn, raw_per_video, G, max_len)

    return TextEncoderBundle(
        apply_fn=apply_fn, params=model.params,
        hidden_size=model.config.hidden_size, tokenize=tokenize,
        pretrained=pretrained)
