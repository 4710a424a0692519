"""Convert an external trained-model dump into the versioned artifact.

The reference's runtime loads a trained model file and extracts the
learned CRF transition tensor — its ONNX session returns
``[logits, transitions]`` (/root/reference/predict.py:19) and its torch
path reads ``crf.transitions`` out of a ``state_dict``
(/root/reference/torch_version/predict_lstm.py:22-58). This module is
the ingestion bridge for exactly that shape of export: given a file
carrying a ``transitions`` tensor (npz or json) and, optionally, the
external tag order, it emits the ner_spark versioned ``.npz`` artifact
(``model/artifact.py`` layout) ready for ``--files`` distribution and
manifest fingerprinting.

What is and is not converted:

* ``transitions`` — ingested, with tag-order re-alignment: external
  exports list tags in THEIR vocabulary order; a ``tags`` array (tag
  name per external index) permutes rows and columns into the engine's
  ``TAG_NAMES`` order. Without ``tags``, the matrix must already be in
  engine order (and the shape must match exactly).
* gazetteer table + scalar hyper-parameters — NOT part of the
  reference's learned CRF export (those weights are its
  embedding/LSTM layers, which our engine replaces with the
  deterministic emission generator); the converted artifact carries the
  currently-active table/scalars, same as ``save_weights``.
"""

from __future__ import annotations

import json
import os

import numpy as np


def read_external(src_path: str) -> tuple[np.ndarray, list[str] | None]:
    """Load (transitions, external tag order or None) from an external
    dump: ``.npz``/``.npy``-style npz with keys ``transitions`` and
    optionally ``tags``, or ``.json`` with the same keys."""
    if src_path.endswith(".json"):
        with open(src_path, encoding="utf-8") as f:
            d = json.load(f)
        if "transitions" not in d:
            raise ValueError(f"{src_path}: no 'transitions' key")
        trans = np.asarray(d["transitions"], dtype=np.float64)
        tags = [str(t) for t in d["tags"]] if "tags" in d else None
        return trans, tags
    with np.load(src_path, allow_pickle=True) as z:
        if "transitions" not in z:
            raise ValueError(
                f"{src_path}: no 'transitions' tensor (keys: {sorted(z.files)})"
            )
        trans = np.asarray(z["transitions"], dtype=np.float64)
        tags = [str(t) for t in z["tags"]] if "tags" in z.files else None
    return trans, tags


def align_transitions(
    trans: np.ndarray, external_tags: list[str] | None
) -> np.ndarray:
    """Permute an external (n, n) transition matrix into the engine's
    ``TAG_NAMES`` row/column order. ``external_tags[i]`` names external
    index i; entry ``out[a, b] = trans[ext(a), ext(b)]``. Raises on
    shape mismatch, non-finite values, or a tag set that does not cover
    the engine's tags (a model trained on a different tag vocabulary
    cannot silently drive this engine)."""
    from ner_spark.model.tagger import TAG_NAMES

    n = len(TAG_NAMES)
    if trans.ndim != 2 or trans.shape[0] != trans.shape[1]:
        raise ValueError(f"transitions must be square, got {trans.shape}")
    if not np.isfinite(trans).all():
        raise ValueError("transitions contain non-finite values")
    if external_tags is None:
        if trans.shape != (n, n):
            raise ValueError(
                f"transitions shape {trans.shape} != ({n}, {n}) and no "
                f"'tags' array to re-align by — refusing to guess"
            )
        return trans.astype(np.float32)
    if len(external_tags) != trans.shape[0]:
        raise ValueError(
            f"'tags' length {len(external_tags)} != matrix dim {trans.shape[0]}"
        )
    pos = {t: i for i, t in enumerate(external_tags)}
    if len(pos) != len(external_tags):
        raise ValueError("duplicate names in 'tags'")
    missing = [t for t in TAG_NAMES if t not in pos]
    if missing:
        raise ValueError(f"external model lacks engine tags: {missing}")
    idx = np.array([pos[t] for t in TAG_NAMES])
    return trans[np.ix_(idx, idx)].astype(np.float32)


def convert_external_artifact(
    src_path: str, out_path: str, version: str
) -> str:
    """External dump → versioned ner_spark artifact at ``out_path``.

    The returned artifact round-trips through ``load_weights`` /
    ``install_weights`` and carries ``version`` — installing it bumps
    the manifest fingerprint, so a resume against data published under
    the previous model is (intentionally) refused."""
    from ner_spark.model.artifact import save_weights

    if not os.path.exists(src_path):
        raise FileNotFoundError(src_path)
    trans, tags = read_external(src_path)
    aligned = align_transitions(trans, tags)
    # save_weights serializes the ACTIVE parameter set; write it first to
    # get the gazetteer/scalar sections verbatim, then splice in the
    # ingested transitions at the raw-array level (atomic via rename).
    tmp = out_path + ".tmp.npz"
    save_weights(tmp, version=version)
    with np.load(tmp, allow_pickle=True) as z:
        arrays = {k: z[k] for k in z.files}
    arrays["transitions"] = aligned
    arrays["version"] = np.array(version)
    np.savez(tmp, **arrays)
    os.replace(tmp, out_path)
    return out_path
