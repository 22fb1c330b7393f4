"""Import shims that make the reference PyTorch repo importable in this
image (torchvision / pycocoevalcap absent, transformers.AdamW removed) —
used ONLY by parity tooling/tests to run the reference model on CPU as a
numerical oracle. Nothing from here ships in gvl_tpu."""

from __future__ import annotations

import importlib.machinery
import sys
import types


def install_reference_shims(reference_path: str = "/root/reference"):
    # transformers must be imported before the torchvision fake exists,
    # because it probes find_spec('torchvision')
    import transformers
    import torch
    if not hasattr(transformers, "AdamW"):
        transformers.AdamW = torch.optim.AdamW

    def fake_module(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    if "torchvision" not in sys.modules:
        tv = fake_module("torchvision")
        tv.__version__ = "0.15"
        ops = fake_module("torchvision.ops")
        boxes = fake_module("torchvision.ops.boxes")
        boxes.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        misc = fake_module("torchvision.ops.misc")
        tv.ops = ops
        ops.boxes = boxes
        ops.misc = misc
        sys.modules.update({"torchvision": tv, "torchvision.ops": ops,
                            "torchvision.ops.boxes": boxes,
                            "torchvision.ops.misc": misc})

    for name in ["pycocoevalcap", "pycocoevalcap.meteor",
                 "pycocoevalcap.meteor.meteor", "pycocoevalcap.bleu",
                 "pycocoevalcap.bleu.bleu"]:
        if name not in sys.modules:
            sys.modules[name] = fake_module(name)
    sys.modules["pycocoevalcap.meteor.meteor"].Meteor = object
    sys.modules["pycocoevalcap.bleu.bleu"].Bleu = object

    if "colorlog" not in sys.modules:
        import logging
        cl = fake_module("colorlog")
        cl.ColoredFormatter = lambda *a, **k: logging.Formatter()
        sys.modules["colorlog"] = cl
    for name in ["six", "six.moves"]:
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                m = fake_module(name)
                if name == "six":
                    m.PY3 = True
                    m.moves = fake_module("six.moves")
                sys.modules[name] = m
    if not hasattr(sys.modules.get("six.moves", None), "cPickle"):
        import pickle
        if "six.moves" in sys.modules:
            sys.modules["six.moves"].cPickle = pickle

    # reference constructs BertEncoder(BertConfig(...)) directly; newer
    # transformers resolves attention by config._attn_implementation, which
    # is None outside from_pretrained — alias it to the eager implementation
    try:
        from transformers.models.bert import modeling_bert as _mb
        if hasattr(_mb, "BERT_SELF_ATTENTION_CLASSES") and \
                None not in _mb.BERT_SELF_ATTENTION_CLASSES:
            _mb.BERT_SELF_ATTENTION_CLASSES[None] = \
                _mb.BERT_SELF_ATTENTION_CLASSES["eager"]
    except Exception:
        pass
    # materializing transformers submodules can swap sys.modules['transformers']
    # for a fresh module object — re-apply the AdamW alias to whatever object
    # future `import transformers` will see
    tmod = sys.modules.get("transformers")
    if tmod is not None and not hasattr(tmod, "AdamW"):
        tmod.AdamW = torch.optim.AdamW

    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)


def install_pycocoevalcap_ports():
    """Install REAL `pycocoevalcap.*` modules backed by gvl_tpu's pure-Python
    scorer ports (Bleu/Meteor/Rouge/Cider/PTBTokenizer), so the reference
    densevid_eval3 harness runs END-TO-END in-sandbox with the same scorer
    numerics on both sides. This converts the metric-harness comparison from
    'spec-faithful by construction' to 'executed-identical': any difference
    between gvl_tpu/eval/metrics/* and the reference harness logic
    (pairing, bucketing, averaging, tokenize placement) shows up as a
    numeric mismatch (VERDICT r3 next-round #1)."""
    from gvl_tpu.eval.metrics.ptb_tokenizer import ptb_tokenize
    from gvl_tpu.eval.metrics.scorers import Bleu, Cider, Meteor, Rouge

    def fake_module(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    class PTBTokenizer:
        def tokenize(self, captions):
            return ptb_tokenize(captions)

    # SPICE is backed by the pure-Python port (approximate CoreNLP-free
    # parser, gvl_tpu/eval/metrics/spice.py) on BOTH sides, so the
    # 2018_cider verbose cross-run compares identical scorer numerics.
    from gvl_tpu.eval.metrics.spice import Spice

    attrs = {
        "pycocoevalcap.tokenizer.ptbtokenizer": ("PTBTokenizer", PTBTokenizer),
        "pycocoevalcap.bleu.bleu": ("Bleu", Bleu),
        "pycocoevalcap.meteor.meteor": ("Meteor", Meteor),
        "pycocoevalcap.rouge.rouge": ("Rouge", Rouge),
        "pycocoevalcap.cider.cider": ("Cider", Cider),
        "pycocoevalcap.spice.spice": ("Spice", Spice),
    }
    for pkg in ["pycocoevalcap", "pycocoevalcap.tokenizer",
                "pycocoevalcap.bleu", "pycocoevalcap.meteor",
                "pycocoevalcap.rouge", "pycocoevalcap.cider",
                "pycocoevalcap.spice"]:
        sys.modules[pkg] = fake_module(pkg)  # overwrite any `object` stubs
    for name, (attr, cls) in attrs.items():
        mod = fake_module(name)
        setattr(mod, attr, cls)
        sys.modules[name] = mod


def import_reference_harness(reference_path: str = "/root/reference"):
    """Make the reference densevid_eval3 harness importable (namespace pkg,
    no __init__.py; SODA/eval_tal use top-level sibling imports) and return
    the dict of its live entry points. Call install_pycocoevalcap_ports()
    FIRST — the harness imports pycocoevalcap at module scope."""
    d3 = reference_path + "/densevid_eval3"
    for p in (reference_path, d3, d3 + "/SODA"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib
    mods = {}
    for name in ["densevid_eval3.eval_dvc", "densevid_eval3.eval_soda",
                 "densevid_eval3.eval_para", "densevid_eval3.eval_grounding",
                 "densevid_eval3.eval_tal"]:
        mods[name.split(".")[-1]] = importlib.import_module(name)
    return mods


def reference_opt(**overrides):
    """A minimal reference-compatible opt namespace (contrastive off so no
    HF downloads are needed)."""
    import argparse
    base = dict(
        enable_contrastive=False, enable_layer_diff_text_feature=False,
        enable_word_context_modeling=False,
        enable_sentence_context_modeling=False,
        hidden_dim=512, nheads=8, enc_layers=2, dec_layers=2,
        transformer_ff_dim=64, transformer_dropout_prob=0.0,
        num_feature_levels=3, dec_n_points=4, enc_n_points=4, num_queries=8,
        num_classes=1, max_eseq_length=6, with_box_refine=True,
        share_caption_head=1, caption_decoder_type="standard", vocab_size=50,
        input_encoding_size=32, rnn_size=512, num_layers=1, drop_prob=0.0,
        max_caption_len=8, att_hid_size=16, cap_nheads=1, cap_dec_n_points=4,
        cap_num_feature_levels=3, clip_context_dim=512,
        wordRNN_input_feats_type="C", feature_dim=16, aux_loss=True,
        disable_mid_caption_heads=False, enable_e2t_cl=False,
        caption_loss_type="ce", caption_cost_type="loss",
        set_cost_caption=0.0, set_cost_class=2.0, set_cost_bbox=0.0,
        set_cost_giou=4.0, cost_alpha=0.25, cost_gamma=2.0,
        cls_loss_coef=2.0, bbox_loss_coef=0.0, giou_loss_coef=4.0,
        count_loss_coef=0.5, caption_loss_coef=2.0,
        contrastive_loss_start_coef=0.0, focal_alpha=0.25, focal_gamma=2.0,
        contrastive_loss_temperature=0.1, enable_cross_video_cl=False,
        enable_bg_for_cl=False, lloss_gau_mask=1, lloss_beta=1.0,
        device="cpu")
    base.update(overrides)
    return argparse.Namespace(**base)
