"""Single-file serving bundles.

Deployment packaging for the serving stack (serve.py / server.py): one
compressed ``.npz`` holding the generator parameters, the vocabulary, and the
full resolved config. A bundle is everything a caption service needs — no
orbax checkpoint directory, vocab pkl, or matching CLI flags at load time.

The reference has no deployment artifact at all: its eval path re-reads the
training checkpoint plus `data/.../word_to_idx.pkl` with hand-matched argparse
flags (run_gun.py:302-310, utils/opt.py). Beyond-parity, like the rest of the
serving story.

Format (version 1, all pickle-free):
- ``__dlsg_meta__``: uint8 array of UTF-8 JSON
  ``{"version": 1, "config": {...}, "vocab": [idx2word...]}``
- ``param/<path>/<to>/<leaf>``: one array per generator parameter leaf
  ('/'-joined flax module path).

Usage:
    save_bundle("model.dlsg.npz", cfg, vocab, params)
    cfg, vocab, params = load_bundle("model.dlsg.npz")
    captioner = Captioner.from_bundle("model.dlsg.npz")      # serve.py
    dlsg-tpu export --metric best_CIDEr --out model.dlsg.npz # cli
    dlsg-tpu serve --bundle model.dlsg.npz --listen :8000
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, Tuple

import numpy as np

from dlsg_tpu.config import DLSGConfig
from dlsg_tpu.vocab import Vocabulary

BUNDLE_VERSION = 1
_META_KEY = "__dlsg_meta__"
_PARAM_PREFIX = "param/"


def _flatten_params(params, prefix="") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in params.items():
        k = str(k)
        if "/" in k:
            raise ValueError(f"parameter path component contains '/': {k!r}")
        path = f"{prefix}{k}"
        if isinstance(v, (dict,)) or hasattr(v, "items"):
            flat.update(_flatten_params(v, prefix=f"{path}/"))
        else:
            flat[path] = np.asarray(v)
    return flat


def _unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    params: Dict = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return params


def save_bundle(path: str, cfg: DLSGConfig, vocab: Vocabulary, params) -> None:
    """Write a version-1 serving bundle (compressed npz, no pickling)."""
    meta = json.dumps({
        "version": BUNDLE_VERSION,
        "config": dataclasses.asdict(cfg),
        "vocab": list(vocab.idx2word),
    })
    arrays = {
        _PARAM_PREFIX + k: v for k, v in _flatten_params(params).items()
    }
    arrays[_META_KEY] = np.frombuffer(meta.encode("utf-8"), dtype=np.uint8)
    # through a file object: np.savez_compressed appends '.npz' to str paths
    # without the suffix, which would misplace a user-named bundle
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_bundle(path: str) -> Tuple[DLSGConfig, Vocabulary, Dict]:
    """Read a bundle back into (cfg, vocab, params).

    The config is reconstructed field-by-field; fields added after the bundle
    was written keep their defaults, and unknown (removed) fields are dropped
    with the bundle still loading — forward/backward compatible within a
    major version.
    """
    with np.load(path, allow_pickle=False) as data:
        if _META_KEY not in data:
            raise ValueError(f"{path} is not a dlsg_tpu bundle (no {_META_KEY})")
        meta = json.loads(bytes(data[_META_KEY].tobytes()).decode("utf-8"))
        if meta.get("version") != BUNDLE_VERSION:
            raise ValueError(
                f"unsupported bundle version {meta.get('version')} "
                f"(this build reads version {BUNDLE_VERSION})"
            )
        flat = {
            k[len(_PARAM_PREFIX):]: data[k]
            for k in data.files
            if k.startswith(_PARAM_PREFIX)
        }
    known = {f.name for f in dataclasses.fields(DLSGConfig)}
    cfg_dict = {
        # JSON turns tuples into lists; every sequence field of DLSGConfig is
        # a tuple (the dataclass is frozen/hashable), so coerce them all back
        k: tuple(v) if isinstance(v, list) else v
        for k, v in meta["config"].items()
        if k in known
    }
    cfg = DLSGConfig(**cfg_dict)
    vocab = Vocabulary.from_idx2word(meta["vocab"])
    return cfg, vocab, _unflatten_params(flat)
