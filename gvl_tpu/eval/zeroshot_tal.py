"""Zero-shot temporal action localization from DVC outputs.

Behavioral spec: reference misc/evaluate_zeroshot_tal.py — each predicted
event carries per-class contrastive scores ('tal_cl_scores' /
'aux_tal_cl_scores': cosine between the event embedding and the embedded
class names); score = proposal_score + alpha * cl_score, argmax class wins,
video ids drop the 'v_' prefix.
"""

from __future__ import annotations

import json
from typing import List, Optional

import numpy as np


def convert_dvc_to_zeroshot_tal(dvc_json: str, class_names: List[str],
                                out_json: Optional[str] = None,
                                alpha: float = 1.0,
                                enable_bg_class: bool = False) -> str:
    out_json = out_json or dvc_json + ".tal_proc.json"
    out = {"version": "VERSION 1.3", "results": {},
           "external_data": {"used": True, "details": "zero-shot GVL-TPU"}}
    with open(dvc_json) as f:
        d = json.load(f)["results"]
    n_class = len(class_names)
    for k, v in d.items():
        vid = k[2:]
        items = []
        for p in v:
            cl_scores = p.get("aux_tal_cl_scores", p.get("tal_cl_scores"))
            if cl_scores is None:
                continue
            assert len(cl_scores) in (n_class, n_class + 1)
            scores = [p["proposal_score"] + alpha * c for c in cl_scores]
            if not enable_bg_class:
                scores = scores[:n_class]
            max_id = int(np.argmax(scores))
            if max_id >= n_class:
                continue
            items.append({"label": class_names[max_id],
                          "score": scores[max_id],
                          "prop_score": p["proposal_score"],
                          "cl_score": cl_scores[max_id],
                          "segment": p["timestamp"]})
        out["results"][vid] = items
    with open(out_json, "w") as f:
        json.dump(out, f)
    return out_json


def embed_class_names(model, params, bundle, text_params, class_names,
                      max_len: int = 8):
    """Class names -> contrastive text embeddings (D_cl,), for attaching
    tal_cl_scores to predictions at eval time."""
    import jax.numpy as jnp
    ids, mask = bundle.tokenize([class_names], len(class_names), max_len)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    B, G, L = ids.shape
    word = bundle.apply_fn(text_params, ids.reshape(B * G, L),
                           mask.reshape(B * G, L)).reshape(B, G, L, -1)
    text = model.apply(params, word, mask.astype(bool),
                       jnp.ones((B, G), bool), None, None,
                       method=model.encode_text)
    return text["final"][0]                              # (n_class, Dcl)


if __name__ == "__main__":
    import sys
    with open("data/anet/anet1.3/action_name.txt") as f:
        names = f.read().split("\n")
    convert_dvc_to_zeroshot_tal(sys.argv[1], names)
