"""The GVL model: PDVC-style deformable-transformer event detector with
contrastive text alignment and parallel captioning heads.

Behavioral spec: reference pdvc/pdvc.py (PDVC module) — base pyramid encoder,
deformable encoder/decoder with iterative box refinement, per-layer
class/count/bbox heads, contrastive projections, caption heads, and the
text-side context modeling.

Architecture notes (TPU-first, not a torch translation):
- one flax module owns the decoder loop, so the bbox heads that drive
  iterative refinement are ordinary shared submodules (the reference wires
  them in with a post-hoc attribute hack, pdvc/pdvc.py:139-146);
- every tensor is fixed-shape: queries (B, Nq), GT events padded to (B, G);
  the reference's ragged flattened caption batches become masked (B, G, ...)
  tensors;
- the trunk (__call__), text head (encode_text) and caption heads
  (caption_train / caption_sample) are separate flax methods so train and
  eval jit exactly what they need.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gvl_tpu.config import Config
from gvl_tpu.models.base_encoder import BasePyramidEncoder
from gvl_tpu.models.captioner import (LightCaptioner, LSTMDSACaptioner,
                                      PuppetCaptioner,
                                      TransformerDSACaptioner, caption_nll)
from gvl_tpu.models.layers import MLP
from gvl_tpu.models.text import SentenceContextBlock, pool_words
from gvl_tpu.models.transformer import (DeformableDecoderLayer,
                                        DeformableEncoder,
                                        expand_reference_for_levels,
                                        flatten_levels, proposal_pos_embed)
from gvl_tpu.utils.boxes import inverse_sigmoid


@dataclasses.dataclass(frozen=True)
class GVLArch:
    """Frozen, hashable architecture spec extracted from Config."""
    hidden_dim: int = 512
    nheads: int = 8
    enc_layers: int = 2
    dec_layers: int = 2
    ff_dim: int = 512
    dropout: float = 0.1
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    num_queries: int = 100
    num_classes: int = 1
    max_eseq_length: int = 10
    with_box_refine: bool = True
    support_mlp_class_head: bool = False
    box_head_init_bias: float = -2.0
    share_caption_head: bool = True
    caption_decoder_type: str = "standard"
    vocab_size: int = 5747
    input_encoding_size: int = 512
    rnn_size: int = 512
    att_hid_size: int = 512
    max_caption_len: int = 30
    drop_prob: float = 0.5
    cap_nheads: int = 1
    cap_dec_n_points: int = 4
    cap_num_feature_levels: int = 4
    cap_num_layers: int = 1
    enable_pos_emb_for_captioner: bool = False
    enable_contrastive: bool = True
    contrastive_hidden_size: int = 128
    enable_multilayer_projection: bool = False
    disable_cl_proj_layer_share_weight: bool = False
    enable_e2t_cl: bool = False
    text_hidden_dim: int = 768
    enable_word_context_modeling: bool = True
    word_context_modeling_type: str = "attention_pool"
    enable_sentence_context_modeling: bool = False
    enable_sentence_pos_embedding: bool = False
    sentence_pos_embedding_type: str = "cosine"
    max_pos_num: int = 500
    sentence_modeling_layer_num: int = 1
    enable_cross_model_fusion: bool = False
    enable_layer_diff_text_feature: bool = False
    msda_impl: str = "pallas"
    caption_scan_loops: bool = False
    dsa_sample_impl: str = "auto"   # captioner DSA sampling: 'twohot' |
                                    # 'gather' | 'auto' (resolves to twohot)
    msda_band_margin: int = 32      # banded encoder kernel halo; 0 = always
                                    # the exact dense kernel
    remat_trunk: bool = False       # rematerialize enc/dec layers in bwd
                                    # (trade recompute FLOPs for HBM — for
                                    # long-video training)
    # gpt2 caption head (ClipCap) spec — populated from load_gpt2_spec
    gpt_vocab_size: int = 1000
    gpt_n_embd: int = 128
    gpt_n_layer: int = 2
    gpt_n_head: int = 4
    prefix_length: int = 10
    prefix_size: int = 512
    gpt_mapping_type: str = "mlp"
    prefix_num_mapping_layer: int = 2
    gpt_stop_token_id: int = 13

    @classmethod
    def from_config(cls, cfg: Config, text_hidden_dim: int = 768,
                    gpt_spec=None) -> "GVLArch":
        gpt_kw = {}
        if gpt_spec is not None:
            gpt_kw = dict(
                gpt_vocab_size=gpt_spec.vocab_size,
                gpt_n_embd=gpt_spec.n_embd, gpt_n_layer=gpt_spec.n_layer,
                gpt_n_head=gpt_spec.n_head,
                prefix_length=gpt_spec.prefix_length,
                prefix_size=gpt_spec.prefix_size,
                gpt_mapping_type=gpt_spec.mapping_type,
                prefix_num_mapping_layer=gpt_spec.prefix_num_mapping_layer,
                gpt_stop_token_id=gpt_spec.stop_token_id)
        return cls._from_config_impl(cfg, text_hidden_dim, gpt_kw)

    @classmethod
    def _from_config_impl(cls, cfg: Config, text_hidden_dim: int,
                          gpt_kw) -> "GVLArch":
        return cls(
            hidden_dim=cfg.hidden_dim, nheads=cfg.nheads,
            enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
            ff_dim=cfg.transformer_ff_dim,
            dropout=cfg.transformer_dropout_prob,
            num_feature_levels=cfg.num_feature_levels,
            enc_n_points=cfg.enc_n_points, dec_n_points=cfg.dec_n_points,
            num_queries=cfg.num_queries, num_classes=cfg.num_classes,
            max_eseq_length=cfg.max_eseq_length,
            with_box_refine=bool(cfg.with_box_refine),
            support_mlp_class_head=cfg.support_mlp_class_head,
            box_head_init_bias=cfg.box_head_init_bias,
            share_caption_head=bool(cfg.share_caption_head),
            caption_decoder_type=cfg.caption_decoder_type,
            vocab_size=cfg.vocab_size,
            input_encoding_size=cfg.input_encoding_size,
            rnn_size=cfg.rnn_size, att_hid_size=cfg.att_hid_size,
            max_caption_len=cfg.max_caption_len, drop_prob=cfg.drop_prob,
            cap_nheads=cfg.cap_nheads, cap_dec_n_points=cfg.cap_dec_n_points,
            cap_num_feature_levels=cfg.cap_num_feature_levels,
            cap_num_layers=cfg.num_layers,
            enable_pos_emb_for_captioner=bool(cfg.get(
                "enable_pos_emb_for_captioner", False)),
            enable_contrastive=cfg.enable_contrastive,
            contrastive_hidden_size=cfg.contrastive_hidden_size,
            enable_multilayer_projection=bool(cfg.enable_multilayer_projection),
            disable_cl_proj_layer_share_weight=cfg.disable_cl_proj_layer_share_weight,
            enable_e2t_cl=cfg.enable_e2t_cl,
            text_hidden_dim=text_hidden_dim,
            enable_word_context_modeling=bool(cfg.enable_word_context_modeling),
            word_context_modeling_type=cfg.word_context_modeling_type,
            enable_sentence_context_modeling=bool(
                cfg.enable_sentence_context_modeling),
            enable_sentence_pos_embedding=bool(cfg.enable_sentence_pos_embedding),
            sentence_pos_embedding_type=cfg.sentence_pos_embedding_type,
            max_pos_num=cfg.max_pos_num,
            sentence_modeling_layer_num=cfg.sentence_modeling_layer_num,
            enable_cross_model_fusion=bool(cfg.enable_cross_model_fusion),
            enable_layer_diff_text_feature=bool(cfg.enable_layer_diff_text_feature),
            msda_impl=cfg.msda_impl,
            caption_scan_loops=bool(cfg.get("caption_scan_loops", False)),
            dsa_sample_impl=str(cfg.get("dsa_sample_impl", "auto")),
            msda_band_margin=int(cfg.get("msda_band_margin", 32)),
            remat_trunk=bool(cfg.get("remat_trunk", False)),
            **gpt_kw,
        )


def _level_masks_placeholder(feat_mask, arch: "GVLArch"):
    """Static per-level lengths of the conv pyramid for a given T."""
    t = feat_mask.shape[1]
    out = [jnp.zeros((1, t))]
    for _ in range(1, arch.num_feature_levels):
        t = (t + 1) // 2
        out.append(jnp.zeros((1, t)))
    return out


def _focal_bias(num_classes: int):
    prior = 0.01
    v = -math.log((1 - prior) / prior)
    return lambda *_: jnp.full((num_classes,), v)


class GVLModel(nn.Module):
    arch: GVLArch

    def setup(self):
        a = self.arch
        num_pred = a.dec_layers

        self.base_encoder = BasePyramidEncoder(a.num_feature_levels,
                                               a.hidden_dim)
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (a.num_feature_levels, a.hidden_dim))
        self.encoder = DeformableEncoder(
            a.hidden_dim, a.ff_dim, a.enc_layers, a.num_feature_levels,
            a.nheads, a.enc_n_points, a.dropout, a.msda_impl,
            a.msda_band_margin, remat=a.remat_trunk)
        # remat_trunk: recompute each layer in the backward instead of
        # storing its activations (exact; static argnums = temporal_shapes
        # tuple + deterministic flag)
        dec_cls = nn.remat(DeformableDecoderLayer, static_argnums=(6, 8)) \
            if a.remat_trunk else DeformableDecoderLayer
        self.dec_layer_mods = [
            dec_cls(a.hidden_dim, a.ff_dim,
                    a.num_feature_levels, a.nheads,
                    a.dec_n_points, a.dropout, a.msda_impl,
                    name=f"decoder_layer_{i}")
            for i in range(a.dec_layers)]

        # query-mode decoder inputs (reference: pdvc.py:71, 271-273)
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (a.num_queries, a.hidden_dim * 2))
        self.reference_head = nn.Dense(
            1, kernel_init=nn.initializers.xavier_uniform(),
            name="reference_points")
        # two-stage proposal inputs (reference: deformable_transformer.py:47-48)
        self.pos_trans = nn.Dense(a.hidden_dim * 2)
        self.pos_trans_norm = nn.LayerNorm(epsilon=1e-5)

        # per-layer heads; cloned when refining boxes, shared otherwise
        # (reference: pdvc.py:134-146)
        def make_class_head(i):
            if a.support_mlp_class_head:
                return MLP(a.hidden_dim, a.num_classes, 3,
                           name=f"class_head_{i}")
            return nn.Dense(a.num_classes, bias_init=_focal_bias(a.num_classes),
                            name=f"class_head_{i}")

        def make_bbox_head(i, with_len_bias):
            bias = (lambda *_: jnp.array([0.0, a.box_head_init_bias])) \
                if with_len_bias else nn.initializers.zeros
            return MLP(a.hidden_dim, 2, 3,
                       final_kernel_init=nn.initializers.zeros,
                       final_bias_init=bias, name=f"bbox_head_{i}")

        if a.with_box_refine:
            self.class_heads = [make_class_head(i) for i in range(num_pred)]
            self.count_heads = [nn.Dense(a.max_eseq_length + 1,
                                         name=f"count_head_{i}")
                                for i in range(num_pred)]
            self.bbox_heads = [make_bbox_head(i, i == 0)
                               for i in range(num_pred)]
        else:
            ch = make_class_head(0)
            cnt = nn.Dense(a.max_eseq_length + 1, name="count_head_0")
            bh = make_bbox_head(0, True)
            self.class_heads = [ch] * num_pred
            self.count_heads = [cnt] * num_pred
            self.bbox_heads = [bh] * num_pred

        # caption heads (reference: pdvc.py:124-130 — shared by default)
        cap = self._make_captioner
        if a.share_caption_head:
            one = cap(0)
            self.caption_heads = [one] * num_pred
        else:
            self.caption_heads = [cap(i) for i in range(num_pred)]

        if a.enable_contrastive:
            def make_event_proj(i):
                if a.enable_multilayer_projection:
                    return MLP(a.hidden_dim, a.contrastive_hidden_size, 2,
                               name=f"cl_proj_event_{i}")
                return nn.Dense(a.contrastive_hidden_size,
                                name=f"cl_proj_event_{i}")

            def make_text_proj(i):
                if a.enable_multilayer_projection:
                    return MLP(a.text_hidden_dim, a.contrastive_hidden_size, 2,
                               name=f"cl_proj_text_{i}")
                return nn.Dense(a.contrastive_hidden_size,
                                name=f"cl_proj_text_{i}")

            num_pred_text = 1 + int(a.enable_sentence_context_modeling)
            if a.disable_cl_proj_layer_share_weight:
                self.cl_proj_event = [make_event_proj(i) for i in range(num_pred)]
                self.cl_proj_text = [make_text_proj(i)
                                     for i in range(num_pred_text)]
            else:
                ep = make_event_proj(0)
                tp = make_text_proj(0)
                self.cl_proj_event = [ep] * num_pred
                self.cl_proj_text = [tp] * num_pred_text

            if a.enable_word_context_modeling:
                self.word_pool = pool_words(a.word_context_modeling_type,
                                            a.text_hidden_dim, "word_context")
            if a.enable_sentence_context_modeling:
                from gvl_tpu.models.text import bert_head_count
                n_heads = bert_head_count(a.text_hidden_dim)
                self.sentence_context = SentenceContextBlock(
                    a.text_hidden_dim, a.sentence_modeling_layer_num,
                    a.enable_sentence_pos_embedding,
                    a.sentence_pos_embedding_type, a.max_pos_num,
                    a.enable_cross_model_fusion, a.hidden_dim,
                    n_heads=n_heads, name="sentence_context")
            if a.enable_e2t_cl:
                self.background_embed = self.param(
                    "background_embed", nn.initializers.normal(1.0),
                    (1, a.contrastive_hidden_size))

    def _make_captioner(self, i):
        a = self.arch
        name = f"caption_head_{i}"
        if a.caption_decoder_type == "standard":
            return LSTMDSACaptioner(
                a.vocab_size, a.input_encoding_size, a.rnn_size, a.hidden_dim,
                a.cap_num_feature_levels, a.cap_nheads, a.cap_dec_n_points,
                a.att_hid_size, a.max_caption_len, a.drop_prob,
                a.enable_pos_emb_for_captioner, a.caption_scan_loops,
                sampled_impl=a.dsa_sample_impl, name=name)
        if a.caption_decoder_type == "transformer":
            return TransformerDSACaptioner(
                a.vocab_size, a.input_encoding_size, a.hidden_dim,
                a.cap_num_layers, a.cap_num_feature_levels, a.cap_nheads,
                a.cap_dec_n_points, a.max_caption_len, a.drop_prob, name=name)
        if a.caption_decoder_type == "light":
            return LightCaptioner(a.vocab_size, a.input_encoding_size,
                                  a.rnn_size, a.max_caption_len, a.drop_prob,
                                  name=name)
        if a.caption_decoder_type == "gpt2":
            from gvl_tpu.models.gpt_captioner import GPT2Captioner, GPT2Spec
            spec = GPT2Spec(
                vocab_size=a.gpt_vocab_size, n_embd=a.gpt_n_embd,
                n_layer=a.gpt_n_layer, n_head=a.gpt_n_head,
                prefix_length=a.prefix_length, prefix_size=a.prefix_size,
                mapping_type=a.gpt_mapping_type,
                prefix_num_mapping_layer=a.prefix_num_mapping_layer,
                stop_token_id=a.gpt_stop_token_id)
            return GPT2Captioner(spec, name=name)
        return PuppetCaptioner(a.vocab_size, a.max_caption_len, name=name)

    # ------------------------------------------------------------------ trunk
    def __call__(self, feats, feat_mask, duration, proposals=None,
                 proposals_mask=None, deterministic: bool = True,
                 disable_iterative_refine: bool = False) -> Dict[str, Any]:
        a = self.arch
        B = feats.shape[0]

        srcs, masks, poses = self.base_encoder(feats, feat_mask, duration)
        src_flat, mask_flat, pos_flat, shapes, valid_ratios = flatten_levels(
            srcs, masks, poses, self.level_embed)
        if a.enc_layers > 0:
            memory = self.encoder(src_flat, pos_flat, mask_flat, shapes,
                                  valid_ratios, deterministic)
        else:
            memory = src_flat

        if proposals is None:
            q = self.query_embed
            query_pos = jnp.broadcast_to(q[None, :, :a.hidden_dim],
                                         (B, a.num_queries, a.hidden_dim))
            tgt = jnp.broadcast_to(q[None, :, a.hidden_dim:],
                                   (B, a.num_queries, a.hidden_dim))
            ref = jax.nn.sigmoid(self.reference_head(query_pos))  # (B,Nq,1)
            qmask = jnp.ones((B, a.num_queries), dtype=bool)
        else:
            # two-stage: GT segments become the decoder queries
            # (reference: prepare_decoder_input_proposal)
            ref = proposals                                       # (B,G,2)
            pos = proposal_pos_embed(inverse_sigmoid(proposals))
            pos = self.pos_trans_norm(self.pos_trans(pos))
            query_pos, tgt = jnp.split(pos, 2, axis=-1)
            qmask = proposals_mask

        init_reference = ref
        hs_list, ref_before_list = [], []
        out = tgt
        for lid, layer in enumerate(self.dec_layer_mods):
            ref_input = expand_reference_for_levels(ref, valid_ratios)
            out = layer(out, query_pos, ref_input, memory, mask_flat, shapes,
                        qmask, deterministic)
            hs_list.append(out)
            ref_before_list.append(ref)
            if a.with_box_refine and not disable_iterative_refine:
                tmp = self.bbox_heads[lid](out)
                ref = jax.lax.stop_gradient(
                    self._refine(tmp, ref))

        # heads over every decoder layer (reference keeps all intermediates:
        # return_intermediate_dec=True)
        logits, counts, coords, event_embeds = [], [], [], []
        for lid in range(a.dec_layers):
            h = hs_list[lid]
            logits.append(self.class_heads[lid](h))
            counts.append(self.count_heads[lid](jnp.max(h, axis=1)))
            if disable_iterative_refine:
                coords.append(jnp.broadcast_to(
                    init_reference, (B,) + init_reference.shape[1:]))
            else:
                tmp = self.bbox_heads[lid](h)
                coords.append(self._refine(tmp, ref_before_list[lid]))
            if a.enable_contrastive:
                event_embeds.append(self.cl_proj_event[lid](h))

        out = {
            "hs": jnp.stack(hs_list),                       # (Ld,B,Nq,C)
            "pred_logits": jnp.stack(logits),               # (Ld,B,Nq,K)
            "pred_count": jnp.stack(counts),                # (Ld,B,E+1)
            "pred_boxes": jnp.stack(coords),                # (Ld,B,Nq,2)
            # per-layer *input* reference; layer 0 is 1-d (center only) in
            # query mode, later layers 2-d after refinement — hence a tuple
            "layer_refs": tuple(ref_before_list),
            "memory": memory,
            "mask_flat": mask_flat,
            "valid_ratios": valid_ratios,
            "query_mask": qmask,
            "query_pos": query_pos,
        }
        if a.enable_contrastive:
            out["event_embed"] = jnp.stack(event_embeds)    # (Ld,B,Nq,Dcl)
            if a.enable_e2t_cl:
                out["background_embed"] = self.background_embed
        return out

    def _refine(self, tmp, ref):
        """Apply the box delta against the (pre-sigmoid) reference.
        Reference: deformable_transformer.py:314-323 / pdvc.py:357-366."""
        if ref.shape[-1] == 2:
            return jax.nn.sigmoid(tmp + inverse_sigmoid(ref))
        center = tmp[..., :1] + inverse_sigmoid(ref)
        return jax.nn.sigmoid(jnp.concatenate([center, tmp[..., 1:]], axis=-1))

    # ------------------------------------------------------------- text side
    def encode_text(self, word_embed, token_mask, sent_mask, memory=None,
                    memory_mask=None, deterministic: bool = True):
        """Pool word embeddings into per-sentence features and project into
        the contrastive space.

        word_embed (B,G,Ltok,Dt) — text-encoder last hidden states;
        token_mask (B,G,Ltok); sent_mask (B,G).
        Returns dict with 'aux'/'final' projected embeddings (B,G,Dcl) and
        their pre-projection counterparts. Per reference pdvc.py:369-376,
        decoder layers 0..Ld-2 consume 'aux' and the last layer 'final'.
        """
        a = self.arch
        if a.enable_word_context_modeling:
            sent = self.word_pool(word_embed, token_mask)
        else:
            sent = word_embed[..., 0, :]   # CLS pooling fallback

        if a.enable_layer_diff_text_feature:
            aux_pre = sent if a.word_context_modeling_type == "attention_pool" \
                else nn.gelu(sent, approximate=False)
            aux = self.cl_proj_text[0](aux_pre)
        else:
            aux_pre, aux = None, None

        final_pre = sent
        if a.enable_sentence_context_modeling:
            final_pre, _ = self.sentence_context(
                sent, sent_mask, memory, memory_mask, deterministic)
        final = self.cl_proj_text[-1](final_pre)

        if aux is None:
            aux, aux_pre = final, final_pre
        return {"aux": aux, "final": final,
                "aux_pre": aux_pre, "final_pre": final_pre}

    # ------------------------------------------------------------ captioning
    def caption_train(self, layer_id: int, query, reference, memory,
                      memory_mask, temporal_shapes, valid_ratios, seq,
                      deterministic: bool = True, ss_prob=0.0,
                      ref_prepared: bool = False):
        head = self.caption_heads[layer_id]
        kwargs = {}
        if isinstance(head, LSTMDSACaptioner):
            kwargs["ss_prob"] = ss_prob
            kwargs["ref_prepared"] = ref_prepared
        elif ref_prepared and not isinstance(head, LightCaptioner):
            # only the LSTM-DSA head consumes prepared references (the
            # light head ignores `reference` entirely)
            raise ValueError("ref_prepared is only supported by the "
                             "standard/light caption heads")
        return head(query, reference, memory, memory_mask, temporal_shapes,
                    valid_ratios, seq, deterministic=deterministic, **kwargs)

    def caption_train_nll(self, layer_id: int, query, reference, memory,
                          memory_mask, temporal_shapes, valid_ratios, seq,
                          seq_mask, deterministic: bool = True,
                          ref_prepared: bool = False):
        """Fused teacher-forcing NLL (B,Ne): identical to caption_train +
        caption_nll but the DSA/LSTM heads never materialize the normalized
        (B,Ne,T,V) logprob tensor (picked-logit minus logsumexp on the raw
        logits). Scheduled sampling is not supported here — the train step
        routes through caption_train when ss_prob > 0."""
        head = self.caption_heads[layer_id]
        if isinstance(head, LSTMDSACaptioner):
            return head.teacher_forced_nll(
                query, reference, memory, memory_mask, temporal_shapes,
                valid_ratios, seq, seq_mask, deterministic=deterministic,
                ref_prepared=ref_prepared)
        if isinstance(head, LightCaptioner):
            return head.teacher_forced_nll(
                query, reference, memory, memory_mask, temporal_shapes,
                valid_ratios, seq, seq_mask, deterministic=deterministic)
        # transformer/puppet heads: logprobs + the reference-form NLL
        lp = self.caption_train(layer_id, query, reference, memory,
                                memory_mask, temporal_shapes, valid_ratios,
                                seq, deterministic=deterministic,
                                ref_prepared=ref_prepared)
        B, Ne = seq.shape[:2]
        return caption_nll(
            lp.reshape(B * Ne, *lp.shape[2:]),
            seq[:, :, 1:].reshape(B * Ne, -1),
            seq_mask[:, :, 1:].reshape(B * Ne, -1)).reshape(B, Ne)

    def caption_sample(self, layer_id: int, query, reference, memory,
                       memory_mask, temporal_shapes, valid_ratios,
                       greedy: bool = True, temperature: float = 1.0,
                       deterministic: bool = True, beam_size: int = 1,
                       early_exit: bool = False, ref_prepared: bool = False):
        head = self.caption_heads[layer_id]
        if beam_size > 1:
            assert isinstance(head, LSTMDSACaptioner), \
                "beam search is implemented for the LSTM-DSA head"
            assert not ref_prepared
            return head.sample_beam(
                query, reference, memory, memory_mask, temporal_shapes,
                valid_ratios, beam_size=beam_size,
                deterministic=deterministic)
        kwargs = {}
        if early_exit and isinstance(head, (LSTMDSACaptioner,
                                            LightCaptioner,
                                            TransformerDSACaptioner)):
            kwargs["early_exit"] = True
        if isinstance(head, LSTMDSACaptioner):
            kwargs["ref_prepared"] = ref_prepared
        elif ref_prepared and not isinstance(head, LightCaptioner):
            # mirrors caption_train: only the LSTM-DSA head consumes
            # prepared references (the light head ignores `reference`)
            raise ValueError("ref_prepared is only supported by the "
                             "standard/light caption heads")
        return head.sample(
            query, reference, memory, memory_mask, temporal_shapes,
            valid_ratios, greedy=greedy, temperature=temperature,
            deterministic=deterministic, **kwargs)

    # -------------------------------------------------------- gpt2 captioner
    def caption_train_gpt(self, layer_id: int, query, tokens, token_mask,
                          deterministic: bool = True):
        """ClipCap training loss per (video, event) pair.
        query (B,Ne,C); tokens/token_mask (B,Ne,Lg). Returns (B,Ne)."""
        B, Ne, C = query.shape
        loss, _ = self.caption_heads[layer_id](
            query.reshape(B * Ne, C),
            tokens.reshape(B * Ne, -1),
            token_mask.reshape(B * Ne, -1).astype(jnp.float32),
            deterministic=deterministic)
        return loss.reshape(B, Ne)

    def caption_sample_gpt(self, layer_id: int, query, entry_length: int = 30,
                           deterministic: bool = True,
                           early_exit: bool = False):
        """Greedy ClipCap decode for all events: (tokens, probs, gen_mask)
        each (B, Ne, L)."""
        B, Ne, C = query.shape
        toks, probs, mask = self.caption_heads[layer_id].sample(
            query.reshape(B * Ne, C), entry_length=entry_length,
            deterministic=deterministic, early_exit=early_exit)
        L = toks.shape[-1]
        return (toks.reshape(B, Ne, L), probs.reshape(B, Ne, L),
                mask.reshape(B, Ne, L))

    # ----------------------------------------------------------------- init
    def init_all(self, feats, feat_mask, duration, word_embed=None,
                 token_mask=None, gt_mask=None, captions=None,
                 proposals=None, proposals_mask=None):
        """Touch every submodule once so a single `init` creates the full
        parameter tree (trunk + text head + caption heads)."""
        a = self.arch
        out = self.__call__(feats, feat_mask, duration, proposals,
                            proposals_mask, deterministic=True)
        if a.enable_contrastive and word_embed is not None:
            self.encode_text(word_embed, token_mask, gt_mask, out["memory"],
                             out["mask_flat"], deterministic=True)
        if captions is not None:
            B, G, _ = captions.shape
            G = min(G, a.num_queries)   # init only touches params; shapes
            captions = captions[:, :G]  # just need to be consistent
            shapes = tuple(int(m.shape[1]) for m in
                           _level_masks_placeholder(feat_mask, a))
            query = out["hs"][-1][:, :G]
            if a.enable_pos_emb_for_captioner:
                query = jnp.concatenate(
                    [query, out["query_pos"][:, :G]], axis=-1)
            ref = out["layer_refs"][-1][:, :G]
            for lid in range(a.dec_layers):
                if a.caption_decoder_type == "gpt2":
                    self.caption_train_gpt(
                        lid, out["hs"][-1][:, :G], captions,
                        jnp.ones_like(captions), deterministic=True)
                else:
                    self.caption_train(lid, query, ref, out["memory"],
                                       out["mask_flat"], shapes,
                                       out["valid_ratios"], captions,
                                       deterministic=True)
                if a.share_caption_head:
                    break
        return out


def build_model(cfg: Config, text_hidden_dim: int = 768,
                gpt_spec=None) -> GVLModel:
    if cfg.caption_decoder_type == "gpt2" and gpt_spec is None:
        from gvl_tpu.models.gpt_captioner import load_gpt2_spec
        gpt_spec, _ = load_gpt2_spec(cfg)
    return GVLModel(GVLArch.from_config(cfg, text_hidden_dim, gpt_spec))
