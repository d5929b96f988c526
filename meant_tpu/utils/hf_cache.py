"""Local HuggingFace cache reader + pretrained-weight grafting.

The reference loads its pretrained backbones with network-backed
`AutoModel.from_pretrained(...)` (`in_loop_train.py:440` bertweet,
`:457` uclanlp/visualbert-vqa-coco-pre, `:465` dandelin/vilt-b32-mlm).
This sandbox has no egress, so this module implements the part
`from_pretrained` does AFTER the download: resolve a model name or
directory against a LOCAL cache, parse `config.json`, read the weights
from `model.safetensors` (single file or sharded via
`model.safetensors.index.json`) or `pytorch_model.bin`, and hand the flat
state-dict to the `utils/port.py` importers.

Cache layouts accepted:
  * a snapshot/plain directory holding config.json + weight files
  * the hub layout: `<root>/models--{org}--{name}/snapshots/<rev>/...`
    (rev picked from `refs/main` when present, else the newest snapshot)
  * roots searched: explicit `cache_dir`, $HF_HUB_CACHE,
    $HUGGINGFACE_HUB_CACHE, $HF_HOME/hub, ~/.cache/huggingface/hub
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

WEIGHT_FILES = ("model.safetensors", "pytorch_model.bin")
SHARD_INDEXES = ("model.safetensors.index.json",
                 "pytorch_model.bin.index.json")


def _cache_roots(cache_dir: Optional[str]):
    roots = []
    if cache_dir:
        roots.append(cache_dir)
    for env in ("HF_HUB_CACHE", "HUGGINGFACE_HUB_CACHE"):
        if os.environ.get(env):
            roots.append(os.environ[env])
    if os.environ.get("HF_HOME"):
        roots.append(os.path.join(os.environ["HF_HOME"], "hub"))
    roots.append(os.path.expanduser("~/.cache/huggingface/hub"))
    return roots


def _has_weights(d: str) -> bool:
    return any(os.path.exists(os.path.join(d, f))
               for f in WEIGHT_FILES + SHARD_INDEXES)


def resolve_snapshot(name_or_dir: str, cache_dir: Optional[str] = None) -> str:
    """Model name ('vinai/bertweet-base') or directory -> the snapshot
    directory holding config.json + weights. Raises FileNotFoundError with
    the searched roots when nothing resolves (no network fallback)."""
    if os.path.isdir(name_or_dir):
        if _has_weights(name_or_dir):
            return name_or_dir
        # maybe it's a hub-layout model dir itself
        snap = _pick_snapshot(name_or_dir)
        if snap:
            return snap
        raise FileNotFoundError(
            f"{name_or_dir} is a directory but holds no model.safetensors/"
            f"pytorch_model.bin (or hub-layout snapshots)")
    folder = "models--" + name_or_dir.replace("/", "--")
    searched = []
    for root in _cache_roots(cache_dir):
        d = os.path.join(root, folder)
        searched.append(d)
        if os.path.isdir(d):
            snap = _pick_snapshot(d)
            if snap:
                return snap
    raise FileNotFoundError(
        f"no local cache for {name_or_dir}; searched: {searched}. "
        f"This sandbox has no network egress — place an HF-layout cache "
        f"there or pass --hf_cache pointing at one.")


def _pick_snapshot(model_dir: str) -> Optional[str]:
    snaps = os.path.join(model_dir, "snapshots")
    if not os.path.isdir(snaps):
        return None
    ref = os.path.join(model_dir, "refs", "main")
    if os.path.exists(ref):
        with open(ref) as f:
            rev = f.read().strip()
        d = os.path.join(snaps, rev)
        if os.path.isdir(d) and _has_weights(d):
            return d
    cands = [os.path.join(snaps, r) for r in sorted(os.listdir(snaps))]
    cands = [d for d in cands if os.path.isdir(d) and _has_weights(d)]
    return max(cands, key=os.path.getmtime) if cands else None


def load_config(snap_dir: str) -> dict:
    with open(os.path.join(snap_dir, "config.json")) as f:
        return json.load(f)


def _load_weight_file(path: str) -> Dict:
    if path.endswith(".safetensors"):
        from safetensors import safe_open
        sd = {}
        # torch framework keeps non-numpy dtypes (bf16) loadable; port._t
        # converts torch tensors to numpy downstream
        with safe_open(path, framework="pt") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
        return sd
    import torch
    return torch.load(path, map_location="cpu", weights_only=True)


def load_state_dict(snap_dir: str) -> Dict:
    """Read the snapshot's weights: sharded index first (every shard merged),
    then single-file safetensors/bin."""
    for index in SHARD_INDEXES:
        ipath = os.path.join(snap_dir, index)
        if os.path.exists(ipath):
            with open(ipath) as f:
                shards = sorted(set(json.load(f)["weight_map"].values()))
            sd = {}
            for shard in shards:
                sd.update(_load_weight_file(os.path.join(snap_dir, shard)))
            return sd
    for fname in WEIGHT_FILES:
        path = os.path.join(snap_dir, fname)
        if os.path.exists(path):
            return _load_weight_file(path)
    raise FileNotFoundError(f"{snap_dir} holds no weight file "
                            f"({WEIGHT_FILES + SHARD_INDEXES})")


def load_pretrained(name_or_dir: str,
                    cache_dir: Optional[str] = None) -> Tuple[dict, Dict]:
    """The no-network `from_pretrained`: (config dict, flat state-dict)."""
    snap = resolve_snapshot(name_or_dir, cache_dir)
    return load_config(snap), load_state_dict(snap)


def _strip_prefix(sd: Dict, prefix: str) -> Dict:
    """AutoModel checkpoints may carry the task-model prefix
    ('roberta.embeddings...' in a RobertaForMaskedLM export); backbone-only
    exports don't. Normalize to backbone-relative keys."""
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}
    return sd


def hf_graft(model_name: str, params: dict, num_encoders: int,
             cache_dir: Optional[str] = None,
             bertweet: str = "vinai/bertweet-base",
             vilt: str = "dandelin/vilt-b32-mlm",
             visualbert: str = "uclanlp/visualbert-vqa-coco-pre") -> dict:
    """The reference's pretrained-init flow (`in_loop_train.py:440-507`) on
    freshly-initialized flax params:

      * every model: bertweet is loaded first (`:440`)
      * meant family: `embedding=bertweet.embeddings` — the RobertaEmbeddings
        subtree is replaced by the ported bertweet one (`:496`)
      * bertweet wrapper: the full backbone imports (`:473-475`)
      * vilt / vl_bert: their published checkpoints import, then
        `embeddings...word_embeddings = bertweet.embeddings.word_embeddings`
        (`:458,466` — the reference swaps the MODULE, changing the vocab)

    Returns a NEW params dict; raises FileNotFoundError when the named
    caches don't exist locally (callers decide whether that's fatal)."""
    from meant_tpu.utils import port

    bcfg, bsd = load_pretrained(bertweet, cache_dir)
    bsd = _strip_prefix(bsd, "roberta.")
    out = dict(params)
    if model_name == "bertweet":
        out["bertweet"] = port.import_hf_roberta(
            bsd, num_encoders,
            num_heads=bcfg.get("num_attention_heads", 12), prefix="")
        return out
    if model_name == "vilt":
        vcfg, vsd = load_pretrained(vilt, cache_dir)
        vp = port.import_vilt(_strip_prefix(vsd, "vilt."), num_encoders,
                              num_heads=vcfg.get("num_attention_heads", 12))
        # reference swaps the word-embedding MODULE for bertweet's
        # (`in_loop_train.py:466`) — the 64001-vocab table replaces ViLT's
        vp["text_embeddings"]["word_embeddings"] = port._t(
            bsd["embeddings.word_embeddings.weight"])
        prev = dict(out.get("vilt", {}))
        prev.update(vp)
        out["vilt"] = prev
        return out
    if model_name == "vl_bert":
        vbcfg, vbsd = load_pretrained(visualbert, cache_dir)
        vbp = port.import_visual_bert(
            _strip_prefix(vbsd, "visual_bert."), num_encoders,
            num_heads=vbcfg.get("num_attention_heads", 12))
        vbp["text_embeddings"]["word_embeddings"] = port._t(
            bsd["embeddings.word_embeddings.weight"])
        prev = dict(out.get("model", {}))   # vl_BERT_Wrapper names its
        prev.update(vbp)                    # VisualBertModel 'model'
        out["model"] = prev
        return out
    if "embedding" in params:          # meant family: embedding graft
        out["embedding"] = port.roberta_embedding_params(bsd, "embeddings.")
        return out
    raise ValueError(f"hf_graft has no flow for model {model_name} "
                     f"(params keys: {sorted(params)[:8]})")
