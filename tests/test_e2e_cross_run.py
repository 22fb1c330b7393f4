"""END-TO-END cross-run parity vs the reference pipeline (VERDICT r4 #1).

Module-level parity (trunk forward, caption logprobs, loss keys, metric
harness) is proven elsewhere; this test composes everything: the REFERENCE
PyTorch pipeline — PropSeqDataset + collate_fn + PDVC + PostProcess +
eval_utils.evaluate (reference eval_utils.py:171-301) — runs on CPU over a
seeded synthetic dataset, then the gvl_tpu pipeline (DenseVideoDataset +
Batcher + EvalRunner + eval_metrics) runs with THE SAME IMPORTED WEIGHTS on
identical data, and the final eval JSONs (pre-rerank and reranked), the
grounding JSONs, and every metric number must agree. This is where matching
tie-breaks, top-k postprocess, rerank, and counter interactions can diverge
while every unit test stays green.

Both sides score through the same scorer numerics: the reference harness
imports pycocoevalcap, which reference_shim.install_pycocoevalcap_ports()
backs with the gvl_tpu ports, so metric deltas isolate PIPELINE composition
differences (not scorer differences — those have their own cross-run suite).
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference"),
    reason="reference repo not mounted (parity oracle unavailable)")

# one semantic world, consumed by the reference argparse/YAML stack and by
# gvl_tpu.config.Config (same key names — the 188/188 flag audit guarantees
# both sides parse these identically)
SHARED_CFG = dict(
    visual_feature_type="tsp", feature_dim=512, frame_embedding_num=32,
    data_rescale=1, data_norm=0, feature_sample_rate=1,
    max_caption_len=8, gt_proposal_sample_num=10,
    # hidden_dim must be 512: the reference position encoding hardcodes a
    # 256-wide duration embedding expand_as the hidden/2 sine embedding
    # (position_encoding.py:35-55)
    hidden_dim=512, nheads=8, enc_layers=2, dec_layers=2,
    transformer_ff_dim=64, transformer_dropout_prob=0.0,
    num_feature_levels=3, dec_n_points=4, enc_n_points=4,
    num_queries=10, num_classes=1, max_eseq_length=10,
    with_box_refine=True, share_caption_head=1,
    caption_decoder_type="standard", input_encoding_size=32, rnn_size=512,
    att_hid_size=16, cap_nheads=1, cap_dec_n_points=4,
    cap_num_feature_levels=3, drop_prob=0.0,
    caption_loss_coef=2.0, count_loss_coef=0.5, cls_loss_coef=2.0,
    bbox_loss_coef=5.0, giou_loss_coef=4.0,
    set_cost_class=2.0, set_cost_bbox=5.0, set_cost_giou=4.0,
    set_cost_caption=0.0, enable_contrastive=False,
    ec_alpha=0.3, eval_batch_size=2, eval_tool_version="2018",
    transformer_input_type="queries", device="cpu",
)


class _StubTokenizer:
    """evaluate() tokenizes captions for the text encoder; with contrastive
    off the model never reads the result (pdvc.py:254), so a constant
    stand-in avoids the HF download."""

    def __call__(self, sents, **kw):
        import torch
        n = max(len(sents), 1)
        return {"input_ids": torch.zeros(n, 4, dtype=torch.long),
                "attention_mask": torch.ones(n, 4, dtype=torch.long)}


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from gvl_tpu.data.synthetic import make_synthetic_dataset
    root = tmp_path_factory.mktemp("e2e")
    anno, feats, vocab, vsize = make_synthetic_dataset(
        str(root), num_videos=6, feat_dim=512, min_events=2, max_events=4,
        seed=11)
    # paragraph GT: vid -> joined paragraph string (reference
    # para_evaluate.py import_ground_truths contract)
    para = str(root / "para_gt.json")
    gt = json.load(open(anno))
    json.dump({v: " ".join(d["sentences"]) for v, d in gt.items()},
              open(para, "w"))
    return dict(root=str(root), anno=anno, feats=feats, vocab=vocab,
                vsize=vsize, para=para,
                grounding=os.path.join(str(root), "grounding.json"))


def _install_np_save(eval_utils):
    """Patch the reference's save_dvc_json with a behavior-identical shim:

    - py3.12/json rejects numpy scalars; the reference's environment
      (np<1.20-era) serialized them fine — cast via .item().
    - evaluate() OVERWRITES the reranked file with the raw results + scores
      at the end (eval_utils.py:298 re-saves out_json to the reassigned
      dvc_json_path), so the true reranked content only exists transiently
      while eval_metrics reads it — snapshot the first write per path.
    Returns the {path: first-written-content} log. Idempotent."""
    class _NpEncoder(json.JSONEncoder):
        def default(self, o):
            if isinstance(o, np.generic):
                return o.item()
            return super().default(o)

    write_log = {}

    def save_dvc_json_np(out_json, path, verbose=False):
        with open(path, "w") as f:
            if verbose:
                out_json["valid_video_num"] = len(out_json["results"])
                out_json["avg_proposal_num"] = np.array(
                    [len(v) for v in out_json["results"].values()]
                ).mean().item()
            json.dump(out_json, f, cls=_NpEncoder)
        if path not in write_log:
            write_log[path] = json.load(open(path))

    eval_utils.save_dvc_json = save_dvc_json_np
    return write_log


@pytest.fixture(scope="module")
def ref_run(world):
    """Run the reference pipeline end-to-end on CPU; return its opt, the
    model state_dict, the output JSON paths, and the returned scores."""
    from reference_shim import (install_reference_shims,
                                install_pycocoevalcap_ports)
    install_reference_shims()
    install_pycocoevalcap_ports()
    import torch
    import yaml

    root = world["root"]
    cfg = dict(SHARED_CFG)
    cfg.update(dict(
        train_caption_file=world["anno"], val_caption_file=world["anno"],
        gt_file_for_eval=[world["anno"]],
        gt_file_for_para_eval=[world["para"]],
        eval_gt_file_for_grounding=world["grounding"],
        visual_feature_folder=world["feats"], dict_file=world["vocab"],
        vocab_size=world["vsize"], invalid_video_json=[],
        disable_tqdm=True))
    # bools -> ints where the reference argparse expects ints is handled by
    # YAML overlay semantics (opts.py:293-294: yaml overrides argv)
    yml = os.path.join(root, "ref_cfg.yml")
    yaml.safe_dump(cfg, open(yml, "w"))

    import opts as ref_opts
    old_argv, old_cwd = sys.argv, os.getcwd()
    os.chdir(root)                      # parse_opts writes .tmp/opts.json
    try:
        sys.argv = ["train.py", "--cfg_path", yml]
        opt = ref_opts.parse_opts()
    finally:
        sys.argv, _ = old_argv, os.chdir(old_cwd)

    torch.manual_seed(7)
    from pdvc.pdvc import build as ref_build
    model, criterion, contrastive_criterion, postprocessors = ref_build(opt)
    model.eval()
    # suppress the UNK logit (id = vocab_size) in the shared weight world:
    # the reference rtranslate cannot decode it (video_dataset.py:229-236
    # joins a defaultdict *int* default), and a random-weights model may
    # emit it. Both sides import this same state_dict, so parity holds.
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("logit.bias") and p.shape[0] == opt.vocab_size + 1:
                p[opt.vocab_size] -= 25.0
    sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}

    from torch.utils.data import DataLoader
    from video_dataset import PropSeqDataset, collate_fn
    val_dataset = PropSeqDataset(opt.val_caption_file,
                                 opt.visual_feature_folder,
                                 opt.dict_file, False, "gt", opt)
    val_loader = DataLoader(val_dataset, batch_size=opt.eval_batch_size,
                            shuffle=False, num_workers=0,
                            collate_fn=collate_fn)

    import eval_utils
    write_log = _install_np_save(eval_utils)
    np.random.seed(123)
    dvc_path = os.path.join(root, "pred_ref.json")
    scores, loss_sum = eval_utils.evaluate(
        model, criterion, contrastive_criterion, postprocessors, val_loader,
        dvc_path, alpha=opt.ec_alpha, device="cpu",
        dvc_eval_version=opt.eval_tool_version, tokenizer=_StubTokenizer())
    rerank_path = dvc_path + "_rerank_alpha0.3_temp2.0.json"
    assert os.path.exists(rerank_path)
    # grounding jsons attach to the post-rerank path (eval_utils.py:269-271)
    return dict(opt=opt, sd=sd, scores=dict(scores), loss=dict(loss_sum),
                raw_json=dvc_path,
                rerank_results=write_log[rerank_path]["results"],
                grounding_json=rerank_path + ".grounding.json")


@pytest.fixture(scope="module")
def our_run(world, ref_run):
    """Run the gvl_tpu pipeline with the imported reference weights on the
    identical data; return output paths + scores."""
    import jax
    import jax.numpy as jnp

    from gvl_tpu.config import Config
    from gvl_tpu.data.dataset import Batcher, DenseVideoDataset
    from gvl_tpu.eval.evaluate import EvalRunner
    from gvl_tpu.eval.metrics import eval_metrics, eval_metrics_grounding
    from gvl_tpu.models import build_model
    from gvl_tpu.train.checkpoint import import_pytorch_state_dict

    cfg = Config()
    cfg.update(dict(SHARED_CFG))
    cfg.update(dict(
        train_caption_file=world["anno"], val_caption_file=world["anno"],
        gt_file_for_eval=[world["anno"]],
        gt_file_for_para_eval=[world["para"]],
        eval_gt_file_for_grounding=world["grounding"],
        visual_feature_folder=world["feats"], dict_file=world["vocab"],
        vocab_size=world["vsize"], with_box_refine=1,
        msda_impl="ref",                 # pure-jnp MSDA on CPU (numerics
                                         # match torch grid_sample exactly)
        eval_disable_plot_hook=True))

    ds = DenseVideoDataset(cfg.val_caption_file, cfg.visual_feature_folder,
                           cfg.dict_file, False, cfg)
    batcher = Batcher(ds, cfg, cfg.eval_batch_size, shuffle=False)
    model = build_model(cfg)

    B, T, D = 2, cfg.frame_embedding_num, cfg.feature_dim
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, T, D)), jnp.ones((B, T), bool),
        jnp.full((B,), 30.0),
        captions=jnp.zeros((B, 3, cfg.max_caption_len), jnp.int32),
        method=model.init_all)
    params, unused, unfilled = import_pytorch_state_dict(
        ref_run["sd"], params, n_heads=cfg.nheads, share_caption_head=True)
    assert unused == [], f"unused torch keys: {unused}"
    assert unfilled == [], f"unfilled flax keys: {unfilled}"

    runner = EvalRunner(cfg, model, None, ds.translator)
    runner.set_params(params, None)
    dvc_path = os.path.join(world["root"], "pred_ours.json")
    out_path, out_json, out_g, aux_g, loss_sum = runner.run(batcher, dvc_path)
    assert out_path.endswith("_rerank_alpha0.3_temp2.0.json")

    scores = dict(eval_metrics(
        out_path, gt_filenames=cfg.gt_file_for_eval,
        para_gt_filenames=cfg.gt_file_for_para_eval,
        dvc_eval_version=cfg.eval_tool_version))
    g_scores = eval_metrics_grounding(out_path + ".grounding.json",
                                      cfg.eval_gt_file_for_grounding)
    scores.update(g_scores)
    aux_scores = eval_metrics_grounding(out_path + "_aux.grounding.json",
                                        cfg.eval_gt_file_for_grounding)
    scores.update({"aux_" + k: v for k, v in aux_scores.items()})
    return dict(scores=scores, loss=dict(loss_sum), raw_json=dvc_path,
                rerank_json=out_path,
                grounding_json=out_path + ".grounding.json")


def _load_results(path):
    return json.load(open(path))["results"]


def _assert_results_match(ours, theirs, ctx, ts_atol=2e-4, score_atol=2e-4):
    assert set(ours.keys()) == set(theirs.keys()), \
        f"{ctx}: video keys differ"
    for vid in sorted(theirs):
        ps_o, ps_t = ours[vid], theirs[vid]
        assert len(ps_o) == len(ps_t), \
            f"{ctx}/{vid}: prediction count {len(ps_o)} vs {len(ps_t)}"
        for i, (po, pt) in enumerate(zip(ps_o, ps_t)):
            where = f"{ctx}/{vid}[{i}]"
            assert po["sentence"] == pt["sentence"], \
                f"{where}: sentence {po['sentence']!r} vs {pt['sentence']!r}"
            assert po["query_id"] == pt["query_id"], f"{where}: query_id"
            assert po["pred_event_count"] == pt["pred_event_count"], \
                f"{where}: pred_event_count"
            np.testing.assert_allclose(po["timestamp"], pt["timestamp"],
                                       atol=ts_atol, rtol=0,
                                       err_msg=f"{where}: timestamp")
            np.testing.assert_allclose(
                po["proposal_score"], pt["proposal_score"], atol=score_atol,
                rtol=0, err_msg=f"{where}: proposal_score")
            np.testing.assert_allclose(
                po["sentence_score"], pt["sentence_score"], atol=5e-3,
                rtol=0, err_msg=f"{where}: sentence_score")


def test_raw_dvc_json_parity(our_run, ref_run):
    """Pre-rerank outputs: every video's prediction list — sentence strings
    exactly, query ids, counter outputs, timestamps/scores to f32
    tolerance."""
    _assert_results_match(_load_results(our_run["raw_json"]),
                          _load_results(ref_run["raw_json"]), "raw")


def test_reranked_dvc_json_parity(our_run, ref_run):
    """Reranked outputs — this additionally covers the joint-score ordering,
    the pred_event_count top-N cut, and the by-time re-sort
    (eval_utils.py:143-168). Compared against the reference's transient
    rerank content (evaluate later overwrites that file with raw results)."""
    _assert_results_match(_load_results(our_run["rerank_json"]),
                          ref_run["rerank_results"], "rerank")


def test_grounding_json_parity(our_run, ref_run):
    # contrastive off => both sides must emit EMPTY grounding results
    # (reference forward_grounding returns None, pdvc.py:950-951)
    assert _load_results(our_run["grounding_json"]) == {}
    assert _load_results(ref_run["grounding_json"]) == {}


def test_metric_numbers_parity(our_run, ref_run):
    ours, theirs = our_run["scores"], ref_run["scores"]
    ours = {k: v for k, v in ours.items() if k != "approx"}
    missing = set(theirs) - set(ours)
    assert not missing, f"metrics missing on our side: {missing}"
    for k in sorted(theirs):
        np.testing.assert_allclose(
            float(ours[k]), float(theirs[k]), atol=1e-6, rtol=0,
            err_msg=f"metric {k} differs: {ours[k]} vs {theirs[k]}")


# ---------------------------------------------------------------------------
# Stage B: contrastive ON -> the grounding path end-to-end. Both sides load
# THE SAME tiny BERT checkpoint from disk (reference: AutoModel/AutoTokenizer
# .from_pretrained(local_dir), pdvc.py:1184-1191; ours: FlaxAutoModel with
# from_pt conversion), so text features, cl_match_mats, the grounding
# matcher, and the emitted grounding JSONs are all composition-compared.
# ---------------------------------------------------------------------------

CL_OVERRIDES = dict(
    enable_contrastive=True, enable_cross_video_cl=True,
    enable_word_context_modeling=True,
    word_context_modeling_type="attention_pool",
    enable_sentence_context_modeling=False,
    contrastive_hidden_size=32, contrastive_loss_temperature=0.1,
    set_cost_cl=2.0, eval_set_cost_class=0.0, eval_set_cost_cl=1.0,
    eval_enable_grounding=True, max_text_input_len=16,
    text_encoder_learning_strategy="frozen",
)


@pytest.fixture(scope="module")
def tiny_hf_dir(world):
    """A tiny BERT checkpoint + WordPiece tokenizer on disk, shared by both
    pipelines (covers the synthetic vocabulary so sentences tokenize to
    distinct ids)."""
    import torch
    from transformers import BertConfig, BertModel, BertTokenizer
    from gvl_tpu.data.synthetic import _WORDS
    d = os.path.join(world["root"], "tiny_bert")
    os.makedirs(d, exist_ok=True)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + sorted(_WORDS)
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    torch.manual_seed(3)
    bc = BertConfig(vocab_size=len(vocab), hidden_size=32,
                    num_hidden_layers=2, num_attention_heads=2,
                    intermediate_size=64, max_position_embeddings=64,
                    type_vocab_size=2)
    BertModel(bc).save_pretrained(d)
    BertTokenizer(os.path.join(d, "vocab.txt")).save_pretrained(d)
    return d


@pytest.fixture(scope="module")
def ref_run_cl(world, tiny_hf_dir):
    from reference_shim import (install_reference_shims,
                                install_pycocoevalcap_ports)
    install_reference_shims()
    install_pycocoevalcap_ports()
    import torch
    import yaml
    from transformers import AutoTokenizer

    root = world["root"]
    cfg = dict(SHARED_CFG)
    cfg.update(CL_OVERRIDES)
    cfg.update(dict(
        train_caption_file=world["anno"], val_caption_file=world["anno"],
        gt_file_for_eval=[world["anno"]],
        gt_file_for_para_eval=[world["para"]],
        eval_gt_file_for_grounding=world["grounding"],
        visual_feature_folder=world["feats"], dict_file=world["vocab"],
        vocab_size=world["vsize"], invalid_video_json=[],
        pretrained_language_model=tiny_hf_dir, disable_tqdm=True))
    yml = os.path.join(root, "ref_cfg_cl.yml")
    yaml.safe_dump(cfg, open(yml, "w"))

    import opts as ref_opts
    old_argv, old_cwd = sys.argv, os.getcwd()
    os.chdir(root)
    try:
        sys.argv = ["train.py", "--cfg_path", yml]
        opt = ref_opts.parse_opts()
    finally:
        sys.argv, _ = old_argv, os.chdir(old_cwd)

    torch.manual_seed(7)
    from pdvc.pdvc import build as ref_build
    model, criterion, contrastive_criterion, postprocessors = ref_build(opt)
    model.eval()
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("logit.bias") and \
                    p.shape[0] == opt.vocab_size + 1:
                p[opt.vocab_size] -= 25.0
    sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}

    from torch.utils.data import DataLoader
    from video_dataset import PropSeqDataset, collate_fn
    val_dataset = PropSeqDataset(opt.val_caption_file,
                                 opt.visual_feature_folder,
                                 opt.dict_file, False, "gt", opt)
    val_loader = DataLoader(val_dataset, batch_size=opt.eval_batch_size,
                            shuffle=False, num_workers=0,
                            collate_fn=collate_fn)

    import eval_utils
    tok = AutoTokenizer.from_pretrained(tiny_hf_dir)
    write_log = _install_np_save(eval_utils)
    np.random.seed(123)
    dvc_path = os.path.join(root, "pred_ref_cl.json")
    scores, loss_sum = eval_utils.evaluate(
        model, criterion, contrastive_criterion, postprocessors, val_loader,
        dvc_path, alpha=opt.ec_alpha, device="cpu",
        dvc_eval_version=opt.eval_tool_version, tokenizer=tok)
    rerank_path = dvc_path + "_rerank_alpha0.3_temp2.0.json"
    return dict(opt=opt, sd=sd, scores=dict(scores), loss=dict(loss_sum),
                raw_json=dvc_path,
                rerank_results=write_log[rerank_path]["results"],
                grounding_json=rerank_path + ".grounding.json",
                aux_grounding_json=rerank_path + "_aux.grounding.json")


@pytest.fixture(scope="module")
def our_run_cl(world, tiny_hf_dir, ref_run_cl):
    from gvl_tpu.config import Config
    from gvl_tpu.data.dataset import Batcher, DenseVideoDataset
    from gvl_tpu.eval.evaluate import EvalRunner
    from gvl_tpu.eval.metrics import eval_metrics, eval_metrics_grounding
    from gvl_tpu.models import build_model
    from gvl_tpu.models.text_encoder import load_text_encoder
    from gvl_tpu.train.checkpoint import import_pytorch_state_dict
    from gvl_tpu.train.loop import init_params

    cfg = Config()
    cfg.update(dict(SHARED_CFG))
    cfg.update(dict(CL_OVERRIDES))
    cfg.update(dict(
        train_caption_file=world["anno"], val_caption_file=world["anno"],
        gt_file_for_eval=[world["anno"]],
        gt_file_for_para_eval=[world["para"]],
        eval_gt_file_for_grounding=world["grounding"],
        visual_feature_folder=world["feats"], dict_file=world["vocab"],
        vocab_size=world["vsize"], with_box_refine=1,
        pretrained_language_model=tiny_hf_dir,
        msda_impl="ref", eval_disable_plot_hook=True))

    bundle = load_text_encoder(cfg)
    assert bundle.pretrained, "tiny BERT checkpoint must load from disk"
    ds = DenseVideoDataset(cfg.val_caption_file, cfg.visual_feature_folder,
                           cfg.dict_file, False, cfg)
    batcher = Batcher(ds, cfg, cfg.eval_batch_size, shuffle=False)
    model = build_model(cfg, text_hidden_dim=bundle.hidden_size)

    probe = next(iter(batcher))
    params = init_params(model, cfg, bundle, probe)
    params, unused, unfilled = import_pytorch_state_dict(
        ref_run_cl["sd"], params, n_heads=cfg.nheads,
        share_caption_head=True)
    assert unused == [], f"unused torch keys: {unused}"
    assert unfilled == [], f"unfilled flax keys: {unfilled}"

    runner = EvalRunner(cfg, model, bundle, ds.translator)
    runner.set_params(params, bundle.params)
    dvc_path = os.path.join(world["root"], "pred_ours_cl.json")
    out_path, out_json, out_g, aux_g, loss_sum = runner.run(batcher, dvc_path)

    scores = dict(eval_metrics(
        out_path, gt_filenames=cfg.gt_file_for_eval,
        para_gt_filenames=cfg.gt_file_for_para_eval,
        dvc_eval_version=cfg.eval_tool_version))
    g_scores = eval_metrics_grounding(out_path + ".grounding.json",
                                      cfg.eval_gt_file_for_grounding)
    scores.update(g_scores)
    aux_scores = eval_metrics_grounding(out_path + "_aux.grounding.json",
                                        cfg.eval_gt_file_for_grounding)
    scores.update({"aux_" + k: v for k, v in aux_scores.items()})
    return dict(scores=scores, loss=dict(loss_sum), raw_json=dvc_path,
                rerank_json=out_path,
                grounding_json=out_path + ".grounding.json",
                aux_grounding_json=out_path + "_aux.grounding.json")


def _assert_grounding_match(ours, theirs, ctx):
    assert set(ours.keys()) == set(theirs.keys()), f"{ctx}: keys differ"
    for k in sorted(theirs):
        lo, lt = ours[k], theirs[k]       # list of matches per GT sentence
        assert len(lo) == len(lt), f"{ctx}/{k}: match count"
        for i, (po, pt) in enumerate(zip(lo, lt)):
            where = f"{ctx}/{k}[{i}]"
            assert po["sentence"] == pt["sentence"], f"{where}: sentence"
            np.testing.assert_allclose(po["timestamp"], pt["timestamp"],
                                       atol=2e-4, rtol=0,
                                       err_msg=f"{where}: timestamp")
            np.testing.assert_allclose(po["score"], pt["score"], atol=2e-4,
                                       rtol=0, err_msg=f"{where}: score")
            np.testing.assert_allclose(po["cl_score"], pt["cl_score"],
                                       atol=2e-3, rtol=0,
                                       err_msg=f"{where}: cl_score")


def test_cl_raw_dvc_json_parity(our_run_cl, ref_run_cl):
    """Contrastive pipeline: raw DVC outputs (now incl. nonzero cl_scores
    from the text/event co-embedding) still match end-to-end."""
    _assert_results_match(_load_results(our_run_cl["raw_json"]),
                          _load_results(ref_run_cl["raw_json"]), "cl-raw")


def test_cl_grounding_json_parity(our_run_cl, ref_run_cl):
    """The grounding path: per-sentence matched segments, confidences and
    contrastive scores — covers text encoding, word-context pooling, the
    contrastive projections, cl_match_mats, and the eval grounding matcher
    (pdvc.py:948-1000) in composition."""
    _assert_grounding_match(_load_results(our_run_cl["grounding_json"]),
                            _load_results(ref_run_cl["grounding_json"]),
                            "grounding")
    _assert_grounding_match(
        _load_results(our_run_cl["aux_grounding_json"]),
        _load_results(ref_run_cl["aux_grounding_json"]), "aux-grounding")


def test_cl_metric_numbers_parity(our_run_cl, ref_run_cl):
    ours, theirs = our_run_cl["scores"], ref_run_cl["scores"]
    ours = {k: v for k, v in ours.items() if k != "approx"}
    missing = set(theirs) - set(ours)
    assert not missing, f"metrics missing on our side: {missing}"
    for k in sorted(theirs):
        np.testing.assert_allclose(
            float(ours[k]), float(theirs[k]), atol=1e-6, rtol=0,
            err_msg=f"metric {k} differs: {ours[k]} vs {theirs[k]}")


def test_eval_loss_parity(our_run, ref_run):
    """Eval-time criterion losses agree. The reference rounds its loss_sum
    to 3 decimals (eval_utils.py:263-265); matching tie-breaks may also pick
    a different equal-cost assignment, so the tolerance is loose — the JSON
    and metric tests above are the exact contract."""
    ours, theirs = our_run["loss"], ref_run["loss"]
    common = set(ours) & set(theirs)
    assert "total_loss" in common or "loss_ce" in common, \
        f"no comparable loss keys: ours={sorted(ours)} theirs={sorted(theirs)}"
    for k in sorted(common):
        np.testing.assert_allclose(
            float(ours[k]), float(theirs[k]), atol=5e-3, rtol=1e-3,
            err_msg=f"eval loss {k}")
