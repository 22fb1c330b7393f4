"""Evaluation driver: runs the jitted eval step over a loader, assembles the
reference's output-JSON contracts bit-for-bit, reranks, and scores.

Behavioral spec: reference eval_utils.py —
- DVC result JSON: {"results": {vid: [{timestamp, raw_box, label,
  proposal_score, sentence, sentence_score, cl_score, query_id, vid_duration,
  pred_event_count}]}, "version", "external_data"} (eval_utils.py:227-240);
- grounding JSON keyed '<vid>-<anno_id>' (eval_utils.py:322-330), plus the
  aux-layer variant from the second-to-last decoder layer;
- reranking: joint = alpha * sentence_score / len(sentence)^temperature +
  proposal_score + w * cl_score, keep top pred_event_count, re-sort by time
  (eval_utils.py:143-168).
"""

from __future__ import annotations

import json
import math
import os
import time
from collections import OrderedDict, deque
from contextlib import contextmanager
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.config import Config
from gvl_tpu.eval.postprocess import (GroundingSpec, detection_outputs,
                                      grounding_outputs)
from gvl_tpu.train.criterion import LossSpec, compute_criterion


def save_dvc_json(out_json: Dict, path: str, verbose: bool = False):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        if verbose:
            out_json["valid_video_num"] = len(out_json["results"])
            out_json["avg_proposal_num"] = float(np.mean(
                [len(v) for v in out_json["results"].values()])) \
                if out_json["results"] else 0.0
        json.dump(out_json, f)


def reranking(p_src: str, alpha: float, cl_score_weight: float,
              temperature: float) -> str:
    """Re-rank predictions by the joint score and truncate to the predicted
    event count (reference: eval_utils.py:143-168)."""
    with open(p_src) as f:
        d = json.load(f)
    for k, v in list(d["results"].items()):
        sent_scores = [p["sentence_score"] /
                       (float(len(p["sentence"].split())) ** temperature + 1e-5)
                       for p in v]
        joint = (alpha * np.array(sent_scores)
                 + np.array([p["proposal_score"] for p in v])
                 + cl_score_weight * np.array([p["cl_score"] for p in v]))
        for i, p in enumerate(v):
            p["joint_score"] = float(joint[i])
        v = sorted(v, key=lambda x: x["joint_score"], reverse=True)
        top_n = int(v[0]["pred_event_count"]) if v else 0
        v = v[:top_n]
        v = sorted(v, key=lambda x: x["timestamp"])
        d["results"][k] = v
    save_path = p_src + f"_rerank_alpha{alpha}_temp{temperature}.json"
    save_dvc_json(d, save_path)
    return save_path


class EvalRunner:
    """Builds the jitted eval computation once and streams batches through."""

    def __init__(self, cfg: Config, model, bundle, translator,
                 gpt_decode=None, mesh=None):
        self.cfg = cfg
        self.model = model
        self.bundle = bundle
        self.translator = translator
        self.gpt_decode = gpt_decode    # token ids -> sentence (gpt2 head)
        # optional data-parallel eval: batches shard over the mesh's 'dp'
        # axis, params replicate; XLA partitions the whole step (the
        # reference has no multi-device eval at all)
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.shape.get("dp", 1)
            assert cfg.eval_batch_size % dp == 0, \
                f"eval_batch_size {cfg.eval_batch_size} must divide by dp={dp}"
        self.class_embeds = None        # (n_class, Dcl) for zero-shot TAL
        self.shapes = tuple(cfg.temporal_shapes())
        self.gspec = GroundingSpec(
            cost_cl=cfg.eval_set_cost_cl, cost_class=cfg.eval_set_cost_class,
            alpha=cfg.eval_grounding_cost_alpha,
            gamma=cfg.eval_grounding_cost_gamma,
            maximum_matching=bool(cfg.eval_enable_maximum_matching_for_grounding))
        self.spec = LossSpec.from_config(cfg)
        self._step = jax.jit(self._eval_step)
        self._match_jit = jax.jit(self._matching_scores)
        self._ground_jit = jax.jit(self._grounding_chunk)

    def _eval_step(self, params, text_params, batch):
        cfg = self.cfg
        from gvl_tpu.models.transformer import pyramid_shapes
        shapes = pyramid_shapes(batch["video_feats"].shape[1],
                                cfg.num_feature_levels)
        two_stage = cfg.transformer_input_type == "gt_proposals"
        full_bf16 = bool(cfg.get("eval_full_bf16", False))
        trunk_params, feats = params, batch["video_feats"]
        if full_bf16:
            # whole-forward bf16 (eval-only): params + feats bf16, trunk
            # outputs recast to f32 below so the criterion / matcher /
            # postprocess math is unchanged in dtype. Flax norms compute
            # stats in f32 regardless; Pallas MSDA accumulates in f32.
            from gvl_tpu.utils.amp import bf16_cast_tree
            trunk_params = bf16_cast_tree(params)
            feats = feats.astype(jnp.bfloat16)
        proposals = batch["gt_boxes"] if two_stage else None
        if two_stage and full_bf16:
            # keep the gt_proposals path dtype-consistent with the bf16
            # trunk: pos_trans / decoder queries would otherwise promote
            # back to f32 against bf16 memory (silent mixed precision)
            proposals = proposals.astype(jnp.bfloat16)
        out = self.model.apply(
            trunk_params, feats, batch["video_mask"],
            batch["duration"],
            proposals=proposals,
            proposals_mask=batch["gt_mask"] if two_stage else None,
            deterministic=True, disable_iterative_refine=two_stage)
        if full_bf16:
            out = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
                out)

        result = {}
        text_layers = None
        if cfg.enable_contrastive:
            ids, tmask = batch["text_ids"], batch["text_mask"]
            B, G, Ltok = ids.shape
            tp = text_params
            if cfg.get("eval_use_amp", False) or full_bf16:
                # bf16 text encoder at eval (reference autocasts it under
                # eval_use_amp, pdvc.py:214-215)
                from gvl_tpu.utils.amp import bf16_cast_tree
                tp = bf16_cast_tree(text_params)
            word = self.bundle.apply_fn(
                tp, ids.reshape(B * G, Ltok),
                tmask.reshape(B * G, Ltok)).astype(jnp.float32).reshape(
                    B, G, Ltok, -1)
            text_out = self.model.apply(
                params, word, tmask.astype(bool), batch["gt_mask"],
                out["memory"], out["mask_flat"], deterministic=True,
                method=self.model.encode_text)
            text_layers = ([text_out["aux"]] * (cfg.dec_layers - 1)
                           + [text_out["final"]])

        losses, _ = compute_criterion(
            out, batch["gt_boxes"], batch["gt_labels"], batch["gt_mask"],
            text_layers, self.spec, row_mask=batch.get("row_valid"))
        result["losses"] = losses

        det = detection_outputs(out, batch["duration"])
        result["det"] = det

        if cfg.caption_loss_coef > 0 and not cfg.eval_disable_captioning \
                and cfg.caption_decoder_type == "gpt2":
            # ClipCap decode (reference: caption_prediction_eval gpt2 branch,
            # pdvc.py:911-919: score = sum of alive-step max-probs; the
            # sample runs under autocast when eval_use_amp — pdvc.py:913-915)
            gpt_params, gpt_hs = params, out["hs"][-1]
            if cfg.get("eval_use_amp", False) \
                    or cfg.get("eval_decode_bf16", False) or full_bf16:
                from gvl_tpu.utils.amp import bf16_cast_tree
                gpt_params = bf16_cast_tree(params)
                gpt_hs = gpt_hs.astype(jnp.bfloat16)
            toks, probs, genmask = self.model.apply(
                gpt_params, cfg.dec_layers - 1, gpt_hs,
                entry_length=cfg.max_caption_len,
                early_exit=bool(cfg.get("eval_decode_early_exit", False)),
                method=self.model.caption_sample_gpt)
            # keep the raw ids but carry the alive-mask: the fixed loop keeps
            # argmax'ing junk past the stop token (the reference per-sample
            # generator breaks instead) and the early-exit while_loop leaves
            # zeros there — and gpt2 id 0 is a real token ('!'), so zeroing
            # ids would corrupt tok.decode. The decode site cuts each caption
            # to its mask length (genmask is a prefix mask: alive until the
            # stop step), which makes both loop variants decode identically.
            result["gpt_tokens"] = toks
            result["gpt_genmask"] = genmask
            result["cap_scores"] = (probs.astype(jnp.float32)
                                    * genmask).sum(-1)
        elif cfg.caption_loss_coef > 0 and not cfg.eval_disable_captioning \
                and cfg.caption_decoder_type != "none":
            query = out["hs"][-1]
            if self.model.arch.enable_pos_emb_for_captioner:
                query = jnp.concatenate([query, out["query_pos"]], -1)
            cap_params = params
            memory = out["memory"]
            if cfg.get("eval_decode_bf16", False) or full_bf16:
                from gvl_tpu.utils.amp import bf16_cast_tree
                cap_params = bf16_cast_tree(params)
                query = query.astype(jnp.bfloat16)
                memory = memory.astype(jnp.bfloat16)
            chunk = int(cfg.get("eval_decode_chunk", 16))
            B = query.shape[0]
            refs, mflat, vr = (out["layer_refs"][-1], out["mask_flat"],
                               out["valid_ratios"])
            if chunk and B > chunk and B % chunk == 0 and \
                    self.mesh is None and \
                    int(cfg.get("eval_beam_size", 1)) <= 1:
                # (chunking is skipped under a mesh: the per-device batch is
                # already B/dp, and reshaping the sharded axis would reshard)
                # decode in chunk-wide slices: clips/s stays flat in batch
                # size (unchunked large-B decode loses ~40% to XLA
                # scheduling pressure — DESIGN.md §8)
                n = B // chunk
                resh = lambda x: x.reshape((n, chunk) + x.shape[1:])
                def piece(args):
                    return self.model.apply(
                        cap_params, cfg.dec_layers - 1, args[0], args[1],
                        args[2], args[3], shapes, args[4],
                        deterministic=True,
                        early_exit=bool(cfg.get("eval_decode_early_exit",
                                                False)),
                        method=self.model.caption_sample)
                seq, lps = jax.lax.map(
                    piece, (resh(query), resh(refs), resh(memory),
                            resh(mflat), resh(vr)))
                seq = seq.reshape((B,) + seq.shape[2:])
                lps = lps.reshape((B,) + lps.shape[2:])
            else:
                seq, lps = self.model.apply(
                    cap_params, cfg.dec_layers - 1, query, refs, memory,
                    mflat, shapes, vr, deterministic=True,
                    beam_size=int(cfg.get("eval_beam_size", 1)),
                    early_exit=bool(cfg.get("eval_decode_early_exit",
                                            False)),
                    method=self.model.caption_sample)
            lps = lps.astype(jnp.float32)
            result["seq"] = seq                                # (B, Nq, Lc)
            result["cap_scores"] = ((seq > 0) * lps).sum(-1)   # (B, Nq)

        if cfg.enable_contrastive and cfg.eval_enable_grounding:
            # layer pairing follows the reference (pdvc.py:371-382): the
            # final decoder layer matches the FINAL text embedding, aux
            # layers match the AUX (pre-context) text embedding
            out["_grounding_text"] = text_out["final"]
            result["grounding"] = grounding_outputs(
                out, batch["duration"], batch["gt_mask"], self.gspec, -1)
            out["_grounding_text"] = text_out["aux"]
            result["grounding_aux"] = grounding_outputs(
                out, batch["duration"], batch["gt_mask"], self.gspec, -2)

        aux = {}
        if cfg.enable_contrastive and cfg.eval_enable_grounding:
            # trunk tensors for chunked grounding over videos with more
            # sentences than the static G (TACoS/MSVG long videos)
            aux.update(g_logits=out["pred_logits"],
                       g_boxes=out["pred_boxes"],
                       g_event=out["event_embed"],
                       g_memory=out["memory"], g_mask_flat=out["mask_flat"],
                       g_duration=batch["duration"])
        if cfg.enable_contrastive and cfg.eval_enable_matching_score:
            # update, don't replace: the g_* tensors above must survive when
            # matching scores and chunked grounding are both enabled
            aux.update(event_embed=out["event_embed"][-1],
                       memory=out["memory"], mask_flat=out["mask_flat"])

        if self.class_embeds is not None:
            # per-class contrastive scores for zero-shot TAL
            # (consumed by gvl_tpu/eval/zeroshot_tal.py)
            for which, layer in (("tal_cl_scores", -1),
                                 ("aux_tal_cl_scores", -2)):
                e = out["event_embed"][layer]
                e = e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-12)
                c = self.class_embeds
                c = c / (jnp.linalg.norm(c, axis=-1, keepdims=True) + 1e-12)
                scores = jnp.einsum("bqd,kd->bqk", e, c)
                result[which] = jnp.take_along_axis(
                    scores, result["det"]["query_idx"][..., None], axis=1)
        return result, aux

    def _grounding_chunk(self, params, text_params, aux, ids, tmask, smask):
        """Grounding for one G-sized slice of sentences against the saved
        trunk outputs — lets eval cover videos with more GT sentences than
        the static G (reference keeps all sentences: pdvc.py:948-1000)."""
        B, G, Ltok = ids.shape
        word = self.bundle.apply_fn(
            text_params, ids.reshape(B * G, Ltok),
            tmask.reshape(B * G, Ltok)).reshape(B, G, Ltok, -1)
        text_out = self.model.apply(
            params, word, tmask.astype(bool), smask,
            aux["g_memory"], aux["g_mask_flat"], deterministic=True,
            method=self.model.encode_text)
        out = {"pred_logits": aux["g_logits"], "pred_boxes": aux["g_boxes"],
               "event_embed": aux["g_event"],
               "_grounding_text": text_out["final"]}
        g_final = grounding_outputs(out, aux["g_duration"], smask,
                                    self.gspec, -1)
        out["_grounding_text"] = text_out["aux"]
        g_aux = grounding_outputs(out, aux["g_duration"], smask,
                                  self.gspec, -2)
        return g_final, g_aux

    def _matching_scores(self, params, text_params, aux, ids, tmask,
                         query_idx):
        """Re-encode the generated captions and score them against their
        events (reference: PostProcess.forward, pdvc.py:1059-1081):
        cl_score[b, rank] = cos(text(caption at rank), event(query of rank)).
        ids (B, Nq, L) tokens of the ranked captions."""
        B, Nq, Ltok = ids.shape
        word = self.bundle.apply_fn(
            text_params, ids.reshape(B * Nq, Ltok),
            tmask.reshape(B * Nq, Ltok)).reshape(B, Nq, Ltok, -1)
        text_out = self.model.apply(
            params, word, tmask.astype(bool), jnp.ones((B, Nq), bool),
            aux["memory"], aux["mask_flat"], deterministic=True,
            method=self.model.encode_text)
        t = text_out["final"]
        e = aux["event_embed"]
        t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
        e = e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-12)
        logits = jnp.einsum("btd,bqd->btq", t, e)
        return jnp.take_along_axis(logits, query_idx[..., None], -1)[..., 0]

    def run(self, batcher, dvc_json_path: str, logger=None,
            score_threshold: float = 0.0, debug: bool = False):
        cfg = self.cfg
        out_json = {"results": {}, "version": "VERSION 1.0",
                    "external_data": {"used:": True, "details": None}}
        out_json_g = {"results": {}}
        aux_out_json_g = {"results": {}}
        loss_sum: "OrderedDict[str, float]" = OrderedDict()
        n_rows_total = 0

        params = self.params
        text_params = self.text_params

        # per-stage host-side wall-time attribution for the e2e number
        # (exposed as runner.last_timing; tools/bench_eval_e2e.py prints it).
        # 'dispatch' is async-call time, 'fetch' is where device + link time
        # surfaces; upload = host->device placement of the feature batch.
        timing: Dict[str, float] = OrderedDict()
        self.last_timing = timing

        @contextmanager
        def tick(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                timing[name] = timing.get(name, 0.0) + (
                    time.perf_counter() - t0)

        def place(arrs: Dict) -> Dict:
            if self.mesh is not None:
                from gvl_tpu.parallel import shard_batch
                return shard_batch(arrs, self.mesh)
            return {k: jnp.asarray(v) for k, v in arrs.items()}

        eval_bs = int(getattr(batcher, "batch_size", 0) or 0)

        def dispatch(batch):
            """Host prep + async device dispatch for one batch (jax returns
            futures; nothing blocks until the consume fetch)."""
            real_b = len(batch["keys"])
            if eval_bs and real_b < eval_bs:
                # pad the final partial batch to the static eval batch size
                # (repeat rows) so it reuses the compiled step instead of
                # triggering one extra trace per eval epoch; assembly below
                # only walks the real keys, and row_valid masks the repeated
                # rows out of every logged loss term.
                reps = [min(i, real_b - 1) for i in range(eval_bs)]
                batch = {k: (v[reps] if isinstance(v, np.ndarray)
                             else [v[i] for i in reps])
                         for k, v in batch.items()}
                # assembly walks only the real keys; device-side lists stay
                # padded so text tokenization matches the padded batch dim
                batch["keys"] = batch["keys"][:real_b]
            arrs = {k: v for k, v in batch.items()
                    if isinstance(v, np.ndarray)}
            arrs["row_valid"] = np.arange(max(eval_bs, real_b)) < real_b
            if cfg.enable_contrastive:
                with tick("tokenize"):
                    ids, tmask = self.bundle.tokenize(
                        batch["captions_raw"], cfg.effective_max_gt_events,
                        cfg.max_text_input_len)
                arrs["text_ids"] = np.asarray(ids)
                arrs["text_mask"] = np.asarray(tmask)
            with tick("upload"):
                db = place(arrs)
            with tick("dispatch"):
                res_dev, aux = self._step(params, text_params, db)
            # start device->host copies now so consume()'s device_get
            # finds the bytes already streaming (on a high-latency link
            # this hides a full round trip per batch; free locally)
            try:
                jax.tree_util.tree_map(
                    lambda x: x.copy_to_host_async(), res_dev)
            except (AttributeError, RuntimeError):
                pass
            return batch, real_b, res_dev, aux

        def consume(pending):
            nonlocal n_rows_total
            batch, real_b, res_dev, aux = pending
            with tick("fetch"):
                res = jax.device_get(res_dev)
            # per-batch losses are means over the batch's real rows; weight
            # by real_b so the epoch aggregate is a true per-video average
            n_rows_total += real_b
            for k, v in res["losses"].items():
                loss_sum[k] = loss_sum.get(k, 0.0) + float(v) * real_b

            if "event_embed" in aux and "seq" in res:
                # matching-score pass over the generated captions
                with tick("match_pass"):
                    qidx = res["det"]["query_idx"]
                    ranked = [[self.translator.rtranslate(res["seq"][b, q])
                               for q in qidx[b]] for b in range(len(qidx))]
                    ids, tmask = self.bundle.tokenize(
                        ranked, qidx.shape[1], cfg.max_text_input_len)
                    min_ = place(dict(ids=np.asarray(ids),
                                      tmask=np.asarray(tmask),
                                      qidx=np.asarray(qidx)))
                    res["det"]["cl_scores"] = np.asarray(self._match_jit(
                        params, text_params, aux, min_["ids"], min_["tmask"],
                        min_["qidx"]))

            with tick("assemble"):
                self._assemble(batch, res, out_json, out_json_g,
                               aux_out_json_g, score_threshold)

            if "grounding" in res:
                # chunk through sentences beyond the static G so every GT
                # sentence gets a '<vid>-<anno_id>' key (VERDICT item 3)
                t0_g = time.perf_counter()
                G = cfg.effective_max_gt_events
                max_sent = max((len(c) for c in batch["captions_raw"]),
                               default=0)
                for start in range(G, max_sent, G):
                    chunk = [c[start:start + G]
                             for c in batch["captions_raw"]]
                    smask = np.zeros((len(chunk), G), bool)
                    for b, c in enumerate(chunk):
                        smask[b, :len(c)] = True
                    ids, tmask = self.bundle.tokenize(
                        chunk, G, cfg.max_text_input_len)
                    gin = place(dict(ids=np.asarray(ids),
                                     tmask=np.asarray(tmask), smask=smask))
                    g_dev = self._ground_jit(
                        params, text_params, aux, gin["ids"], gin["tmask"],
                        gin["smask"])
                    g, ga = jax.device_get(g_dev)
                    self._assemble_grounding(batch, g, ga, start,
                                             out_json_g, aux_out_json_g)
                timing["grounding_chunks"] = timing.get(
                    "grounding_chunks", 0.0) + (time.perf_counter() - t0_g)

        # up to `depth` batches kept in flight: batch t+k's device step is
        # dispatched before batch t's results are fetched/assembled, so the
        # per-batch host work (tokenize/detokenize/JSON assembly) and the
        # per-fetch link latency overlap device compute instead of
        # serializing with it. depth 1 = the classic one-in-flight pipeline;
        # larger depths only matter on high-latency links (each in-flight
        # batch holds its result tree on device + host staging).
        serial = os.environ.get("GVL_EVAL_SERIAL", "") not in ("", "0")
        depth = 0 if serial else max(
            1, int(os.environ.get("GVL_EVAL_PIPELINE_DEPTH", "1") or 1))
        pending: deque = deque()
        it = iter(batcher)
        while True:
            with tick("batcher"):       # host feature load/resize/collate
                batch = next(it, None)
            if batch is None:
                break
            pending.append(dispatch(batch))
            while len(pending) > depth:
                consume(pending.popleft())
            if debug and len(out_json["results"]) > 5:
                pending.clear()         # drop the in-flight batches
                break
        while pending:
            consume(pending.popleft())

        for k in loss_sum:
            loss_sum[k] = round(loss_sum[k] / (n_rows_total + 1e-5), 3)
        if logger is not None:
            logger.info("eval loss: {}".format(dict(loss_sum)))

        if self.cfg.only_ft_class_head and \
                getattr(batcher.ds, "name_map", None) is not None:
            # TAL submission: class indices -> names (reference:
            # eval_utils.collect_tal_result, eval_utils.py:303-319)
            name_map = batcher.ds.name_map
            tal_json = {"results": {}, "version": "VERSION 1.3",
                        "external_data": {}}
            for vid, items in out_json["results"].items():
                tal_json["results"][vid[2:]] = [
                    {"label": name_map.convert_idx2name(p["label"]),
                     "segment": p["timestamp"],
                     "score": p["proposal_score"]} for p in items]
            self.last_tal_json = dvc_json_path[:-5] + ".tal.json"
            save_dvc_json(tal_json, self.last_tal_json)

        with tick("finalize"):          # JSON saves + plot hook + rerank
            save_dvc_json(out_json, dvc_json_path, verbose=True)
            if not cfg.get("eval_disable_plot_hook", False):
                # reference renders this after every eval (best-effort,
                # eval_utils.py:258-261); the knob exists because the
                # figure costs seconds of host time per epoch
                try:
                    from gvl_tpu.eval.plots import plot_proposal_distribution
                    plot_proposal_distribution(dvc_json_path)
                except Exception:
                    pass
            if cfg.get("eval_save_qualitative_plots", False) and \
                    cfg.gt_file_for_eval:
                # duration-bucketed splits + per-video timelines (reference
                # misc/plot/*), best-effort like the plot hook above
                try:
                    from gvl_tpu.eval.plots import (
                        split_results_by_duration, visualize_video_results)
                    gt0 = cfg.gt_file_for_eval[0]
                    split_results_by_duration(dvc_json_path, gt0)
                    visualize_video_results(
                        {"model": dvc_json_path}, gt0,
                        out_dir=dvc_json_path + "_timelines")
                except Exception:
                    pass
            if cfg.count_loss_coef > 0:
                dvc_json_path = reranking(
                    dvc_json_path, alpha=cfg.ec_alpha,
                    cl_score_weight=cfg.eval_matching_score_weight,
                    temperature=2.0)
            save_dvc_json(out_json_g, dvc_json_path + ".grounding.json")
            save_dvc_json(aux_out_json_g,
                          dvc_json_path + "_aux.grounding.json")
        return dvc_json_path, out_json, out_json_g, aux_out_json_g, loss_sum

    def _assemble(self, batch, res, out_json, out_json_g, aux_out_json_g,
                  score_threshold):
        cfg = self.cfg
        det = res["det"]
        B, Nq = det["scores"].shape
        have_caps = "seq" in res
        have_gpt = "gpt_tokens" in res
        for b, vid in enumerate(batch["keys"]):
            duration = float(batch["duration"][b])
            raw_boxes = det["raw_boxes"][b]
            raw_mask = raw_boxes.sum(1) != 0
            items = []
            for pid in range(Nq):
                score = float(det["scores"][b, pid])
                if score <= score_threshold or not raw_mask[pid]:
                    continue
                q = int(det["query_idx"][b, pid])
                if have_caps:
                    sent = self.translator.rtranslate(res["seq"][b, q])
                    sent_score = float(res["cap_scores"][b, q])
                elif have_gpt:
                    n = int(res["gpt_genmask"][b, q].sum())
                    ids = res["gpt_tokens"][b, q][:n]
                    if self.gpt_decode is not None:
                        sent = self.gpt_decode(ids)
                    else:
                        # ids are already cut to the pre-stop prefix; id 0
                        # is a real token there, so no filtering
                        sent = " ".join(f"w{int(i)}" for i in ids)
                    sent_score = float(res["cap_scores"][b, q])
                else:
                    sent, sent_score = "", -1e5
                cl_score = float(det["cl_scores"][b, pid]) \
                    if "cl_scores" in det else 0.0
                extra = {}
                if "tal_cl_scores" in res:
                    extra["tal_cl_scores"] = \
                        res["tal_cl_scores"][b, pid].tolist()
                    extra["aux_tal_cl_scores"] = \
                        res["aux_tal_cl_scores"][b, pid].tolist()
                items.append({
                    **extra,
                    "timestamp": det["boxes"][b, pid].tolist(),
                    "raw_box": raw_boxes[pid].tolist(),
                    "label": int(det["labels"][b, pid]),
                    "proposal_score": score,
                    "sentence": sent,
                    "sentence_score": sent_score,
                    "cl_score": cl_score,
                    "query_id": q,
                    "vid_duration": duration,
                    "pred_event_count": int(det["pred_count"][b]),
                })
            out_json["results"][vid] = items

        if "grounding" in res:
            self._assemble_grounding(batch, res["grounding"],
                                     res["grounding_aux"], 0, out_json_g,
                                     aux_out_json_g)

    def _assemble_grounding(self, batch, g, ga, offset, out_json_g,
                            aux_out_json_g):
        """Write grounding keys '<vid>-<anno_id>' for the sentence slice
        [offset, offset+G) (reference: eval_utils.py:322-330)."""
        G = self.cfg.effective_max_gt_events
        for b, vid in enumerate(batch["keys"]):
            n_sent = len(batch["captions_raw"][b])
            v_name = vid[2:] if len(vid) > 11 else vid
            for which, dst in ((g, out_json_g), (ga, aux_out_json_g)):
                for pid in range(min(n_sent - offset, G)):
                    dst["results"][f"{v_name}-{offset + pid}"] = [{
                        "timestamp": which["boxes"][b, pid].tolist(),
                        "score": float(which["confs"][b, pid]),
                        "cl_score": float(which["cl_scores"][b, pid]),
                        "sentence": batch["captions_raw"][b][offset + pid],
                    }]

    def set_params(self, params, text_params):
        if self.mesh is not None:
            from gvl_tpu.parallel import replicate_tree
            params = replicate_tree(params, self.mesh)
            if text_params is not None:
                text_params = replicate_tree(text_params, self.mesh)
        self.params = params
        self.text_params = text_params

    def enable_zeroshot_tal(self, class_names, max_len: int = 8):
        """Embed action-class names so every prediction carries
        tal_cl_scores (reference: misc/evaluate_zeroshot_tal.py input)."""
        from gvl_tpu.eval.zeroshot_tal import embed_class_names
        self.class_embeds = embed_class_names(
            self.model, self.params, self.bundle, self.text_params,
            class_names, max_len)
