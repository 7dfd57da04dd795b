"""Model zoo: named checkpoints, download with sha256 verification, torch ->
npz conversion cache, and random-init dev models.

Replaces the reference loader (`/root/reference/clip/clip.py:29-189`) with a
conversion-once design: the first load of a torch ``.pt`` converts to a flax
``.npz`` cache; every later load is torch-free.

Resolution order for ``load(name)``:
  1. converted ``.npz`` cache under ``<cache_dir>/converted/``
  2. a local filesystem path to a torch checkpoint
  3. a known zoo name -> download (sha256-verified) -> convert
  4. ``random:<ARCH>`` (e.g. ``random:ViT-B/32``) -> randomly initialized
     params for development/tests (optionally shrunk with ``random_cfg``).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import re
import urllib.request
import warnings
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .clip import CLIP_ARCHS, CLIPConfig, CLIPModel
from .convnext import register_convnext_archs

register_convnext_archs()  # 'random:convnext_*' resolves via CLIP_ARCHS
from .convert import (  # noqa: E402
    cast_params,
    load_params_npz,
    save_params_npz,
    torch_state_dict_to_params,
)

# Official OpenAI CLIP release artifacts (public URLs; the path component
# embeds the artifact's sha256 which we verify after download).
_ZOO_URLS: Dict[str, str] = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "RN50x64": "https://openaipublic.azureedge.net/clip/models/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "ViT-L/14@336px": "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",
}


def available_models():
    return list(_ZOO_URLS)


def default_cache_root() -> Path:
    return Path(os.path.expanduser("~/.cache/aihab_clip_tpu"))


@dataclasses.dataclass
class CLIPBundle:
    name: str
    config: Any                  # CLIPConfig | SigLIPConfig
    model: Any                   # CLIPModel | SigLIPModel
    params: Dict[str, Any]
    source: str  # 'npz-cache' | 'torch' | 'download' | 'hf-local' | 'random'
    tokenize_fn: Any = None      # optional override (e.g. HF sentencepiece)

    @property
    def input_resolution(self) -> int:
        return self.config.image_resolution


# Known aliases: open_clip/timm hub names -> HF transformers repos that hold
# the same weights in SiglipModel format.
_SIGLIP_HF_ALIASES = {
    "timm/ViT-SO400M-16-SigLIP2-384": "google/siglip2-so400m-patch16-384",
    "timm/ViT-B-16-SigLIP": "google/siglip-base-patch16-224",
}


def _siglip_arch_for(name: str):
    from .siglip import SIGLIP_ARCHS, siglip_config_for_name

    stripped = name.replace("hf-hub:", "").replace("random:", "")
    if stripped in SIGLIP_ARCHS:
        return stripped, SIGLIP_ARCHS[stripped]
    tail = stripped.split("/")[-1]
    if tail in SIGLIP_ARCHS:
        return tail, SIGLIP_ARCHS[tail]
    # the open_clip tag grid (size x patch x SigLIP1/2 x resolution) is
    # parsed generically — any ViT-{B,L,SO400M}-<p>-SigLIP[2][-<res>] tag
    # gets its real dimensions, not a fallback
    for cand in (stripped, tail):
        cfg = siglip_config_for_name(cand)
        if cfg is not None:
            return cand, cfg
    if "siglip" in stripped.lower():
        # default to the SO400M-16-384 family when the exact variant is not
        # in the registry (e.g. gopt-size tags outside the parsed grid)
        return ("ViT-SO400M-16-SigLIP2-384",
                SIGLIP_ARCHS["ViT-SO400M-16-SigLIP2-384"])
    return None, None


class SigLIPAssetsMissingError(FileNotFoundError):
    """A SigLIP model was requested by name but the local snapshot (weights
    and/or tokenizer) is absent.

    SigLIP text encoding REQUIRES the snapshot's sentencepiece/fast
    tokenizer — the CLIP BPE vocabulary produces wrong token ids for these
    checkpoints, so falling back silently would corrupt the text head
    (VERDICT.md r1 missing-#2).  The reference gets its tokenizer from the
    open_clip factory (`/root/reference/aihab_utils/model_init.py:60-77`),
    which downloads on demand; this zero-egress build needs a local
    snapshot instead."""


def _snapshot_recipe(repo: str) -> str:
    return (
        f"Fetch a snapshot once (network required):\n"
        f"    hf download {repo}\n"
        f"(or `huggingface-cli download {repo}`); it lands under "
        f"~/.cache/huggingface/hub and every later run is offline.  "
        f"Set HF_HOME to relocate the cache.  To develop without weights "
        f"use 'random:<arch>' or pass allow_random_fallback=True / set "
        f"`allow_random_weights: true` in the config.")


def _hf_tokenizer_fn(repo: str):
    """SigLIP checkpoints tokenize with the snapshot's sentencepiece /
    fast tokenizer; load it from the local snapshot (never downloads).
    Returns None when the snapshot exists but carries no tokenizer assets."""
    import numpy as _np
    import transformers

    from .convert_hf import find_local_hf_snapshot

    snap = find_local_hf_snapshot(repo)
    if snap is None:
        return None
    try:
        tok = transformers.AutoTokenizer.from_pretrained(str(snap))
    except Exception:
        return None

    def tokenize_fn(texts, context_length):
        enc = tok(list(texts), padding="max_length", truncation=True,
                  max_length=context_length, return_tensors="np")
        return enc["input_ids"].astype(_np.int32)

    return tokenize_fn


def _load_siglip(name: str, dtype, param_dtype, remat: bool, seed: int,
                 allow_random_fallback: bool = False,
                 require_tokenizer: bool = True) -> CLIPBundle:
    """SigLIP path: local HF snapshot when present; otherwise a hard
    error with the snapshot recipe (random init only for ``random:``
    names or with explicit ``allow_random_fallback``)."""
    import jax
    import jax.numpy as jnp

    from .convert_hf import load_local_hf_siglip
    from .siglip import SigLIPModel

    arch_name, arch_cfg = _siglip_arch_for(name)
    stripped = name.replace("hf-hub:", "").replace("random:", "")
    repo_candidates = [stripped]
    if stripped in _SIGLIP_HF_ALIASES:
        repo_candidates.append(_SIGLIP_HF_ALIASES[stripped])

    if not name.startswith("random:"):
        for repo in repo_candidates:
            try:
                cfg, params = load_local_hf_siglip(repo)
            except FileNotFoundError:
                continue
            model = SigLIPModel(cfg, dtype=dtype, param_dtype=param_dtype,
                                remat=remat)
            params = cast_params(params, param_dtype)
            tokenize_fn = _hf_tokenizer_fn(repo)
            if tokenize_fn is None and require_tokenizer:
                raise SigLIPAssetsMissingError(
                    f"Local snapshot for '{repo}' has weights but no "
                    f"loadable tokenizer assets — SigLIP text encoding "
                    f"would use wrong token ids.  Re-fetch the full "
                    f"snapshot.  " + _snapshot_recipe(repo))
            return CLIPBundle(name=name, config=cfg, model=model,
                              params=params, source="hf-local",
                              tokenize_fn=tokenize_fn)
        if not allow_random_fallback:
            raise SigLIPAssetsMissingError(
                f"No local HF snapshot for SigLIP '{name}' (searched "
                f"{repo_candidates}).  " + _snapshot_recipe(
                    repo_candidates[-1]))
        warnings.warn(
            f"No local weights for SigLIP '{name}'; using random init "
            f"({arch_name})")

    model = SigLIPModel(arch_cfg, dtype=dtype, param_dtype=param_dtype,
                        remat=remat)
    variables = model.init(
        jax.random.key(seed),
        jnp.zeros((1, arch_cfg.image_resolution, arch_cfg.image_resolution, 3)),
        jnp.zeros((1, arch_cfg.context_length), jnp.int32),
    )
    return CLIPBundle(name=name, config=arch_cfg, model=model,
                      params=variables["params"], source="random")


def _load_convnext(name: str, dtype, param_dtype, remat: bool, seed: int,
                   cache_root: Path,
                   allow_random_fallback: bool = False) -> CLIPBundle:
    """ConvNeXt-CLIP path (LAION open_clip family): converted-npz cache,
    then a local HF snapshot's open_clip checkpoint, else a hard error
    with the snapshot recipe.  Unlike SigLIP there is no tokenizer gate —
    these checkpoints use the standard CLIP BPE text tower."""
    from .convnext import (
        convnext_config_for_name,
        openclip_convnext_state_dict_to_params,
    )

    # A checkpoint file path need not embed a known tag — the shape-
    # inferring converter handles those (resolution then comes from the
    # converter's default + warning).  Tag parsing (which hard-errors on
    # unknown 'convnext' variants) is reserved for non-path names.
    if os.path.isfile(name.replace("hf-hub:", "")):
        try:
            cfg = convnext_config_for_name(name)  # path may embed a tag
        except ValueError:
            cfg = None  # unknown variant in a path: infer from shapes
    else:
        cfg = convnext_config_for_name(name)  # ValueError on unknown variants
        assert cfg is not None  # caller gated on 'convnext' in the name

    npz = _npz_cache_path(name, cache_root)
    cfg_path = _config_cache_path(name, cache_root)
    if npz.is_file() and cfg_path.is_file():
        ccfg = _load_config(cfg_path)
        params = cast_params(load_params_npz(npz), param_dtype)
        model = CLIPModel(ccfg, dtype=dtype, param_dtype=param_dtype,
                          remat=remat)
        return CLIPBundle(name=name, config=ccfg, model=model, params=params,
                          source="npz-cache")

    stripped = name.replace("hf-hub:", "")
    ckpt = None
    source = "torch"
    if os.path.isfile(stripped):
        ckpt = Path(stripped)
    elif "/" in stripped:
        from .convert_hf import find_local_hf_snapshot

        snap = find_local_hf_snapshot(stripped)
        if snap is not None:
            for pattern in ("open_clip_pytorch_model.bin", "*.bin", "*.pt"):
                hits = sorted(snap.glob(pattern))
                if hits:
                    ckpt = hits[0]
                    source = "hf-local"
                    break
    if ckpt is not None:
        import torch

        obj = torch.load(str(ckpt), map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        sd = sd.get("state_dict", sd)
        ccfg, params = openclip_convnext_state_dict_to_params(
            sd, resolution=cfg.image_resolution if cfg is not None else 0)
        npz.parent.mkdir(parents=True, exist_ok=True)
        save_params_npz(npz, params)
        _save_config(cfg_path, ccfg)
        model = CLIPModel(ccfg, dtype=dtype, param_dtype=param_dtype,
                          remat=remat)
        return CLIPBundle(name=name, config=ccfg, model=model,
                          params=cast_params(params, param_dtype),
                          source=source)

    if not name.startswith("random:") and not allow_random_fallback:
        raise FileNotFoundError(
            f"No local weights for ConvNeXt-CLIP '{name}'.  "
            + _snapshot_recipe(
                stripped if "/" in stripped
                else f"laion/CLIP-{stripped}-laion2B (or another LAION "
                     f"'{stripped}' repo)"))
    if not name.startswith("random:"):
        warnings.warn(f"No local weights for ConvNeXt '{name}'; "
                      "using random init")
    model = CLIPModel(cfg, dtype=dtype, param_dtype=param_dtype, remat=remat)
    variables = model.init(
        jax.random.key(seed),
        jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
        jnp.zeros((1, cfg.context_length), jnp.int32),
    )
    return CLIPBundle(name=name, config=cfg, model=model,
                      params=variables["params"], source="random")


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_checkpoint(name: str, root: Path) -> Path:
    url = _ZOO_URLS[name]
    expected_sha = url.split("/")[-2]
    root.mkdir(parents=True, exist_ok=True)
    target = root / os.path.basename(url)
    if target.is_file():
        if _sha256(target) == expected_sha:
            return target
        warnings.warn(f"{target} exists with bad sha256; re-downloading")
    urllib.request.urlretrieve(url, target)
    if _sha256(target) != expected_sha:
        raise RuntimeError(
            f"Downloaded {name} checkpoint has mismatched sha256")
    return target


def _convert_torch_checkpoint(path: Path):
    """Load a torch CLIP checkpoint (JIT archive or plain state dict) and
    convert to (config, flax params). Torch is only needed on this path."""
    import torch

    try:
        jit_model = torch.jit.load(str(path), map_location="cpu")
        state_dict = jit_model.state_dict()
    except RuntimeError:
        obj = torch.load(str(path), map_location="cpu", weights_only=False)
        state_dict = obj.state_dict() if hasattr(obj, "state_dict") else obj
        state_dict = state_dict.get("state_dict", state_dict)
    return torch_state_dict_to_params(state_dict)


def _npz_cache_path(key: str, cache_root: Path) -> Path:
    safe = key.replace("/", "-").replace(":", "_").replace("@", "_")
    return cache_root / "converted" / f"{safe}.npz"


def _config_cache_path(key: str, cache_root: Path) -> Path:
    return _npz_cache_path(key, cache_root).with_suffix(".config.json")


def _save_config(path: Path, cfg: CLIPConfig) -> None:
    import json

    d = dataclasses.asdict(cfg)
    path.write_text(json.dumps(d))


def _load_config(path: Path) -> CLIPConfig:
    import json

    d = json.loads(path.read_text())
    if isinstance(d["vision_layers"], list):
        d["vision_layers"] = tuple(d["vision_layers"])
    return CLIPConfig(**d)


def _normalize_openclip_name(name: str) -> str:
    """Accept OpenCLIP-style dashed architecture names (the reference's
    openclip backend takes e.g. ``ViT-B-16``, ``ViT-L-14-336`` —
    `/root/reference/aihab_utils/model_init.py:42-60`) by mapping them to
    the zoo's OpenAI-style keys (``ViT-B/16``, ``ViT-L/14@336px``)."""
    prefix, _, arch = name.rpartition(":")
    m = re.fullmatch(r"(ViT-[A-Za-z]+)-(\d+)(?:-(\d+))?(?:px)?", arch)
    if m:
        mapped = f"{m.group(1)}/{m.group(2)}"
        if m.group(3):
            mapped += f"@{m.group(3)}px"
        if mapped in CLIP_ARCHS:
            return f"{prefix}:{mapped}" if prefix else mapped
    return name


def load(
    name: str,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    cache_dir: Optional[str] = None,
    download: bool = True,
    random_cfg: Optional[CLIPConfig] = None,
    remat: bool = False,
    seed: int = 0,
    allow_random_fallback: bool = False,
    require_tokenizer: bool = True,
) -> CLIPBundle:
    name = _normalize_openclip_name(name)
    cache_root = Path(cache_dir) if cache_dir else default_cache_root()

    # SigLIP family (hf-hub names, registry names, random:SigLIP-*)
    from .siglip import SIGLIP_ARCHS

    plain = name.replace("random:", "").replace("hf-hub:", "")
    is_siglip = ("siglip" in name.lower()
                 or plain in SIGLIP_ARCHS
                 or plain.split("/")[-1] in SIGLIP_ARCHS)
    if is_siglip and random_cfg is None:
        return _load_siglip(name, dtype, param_dtype, remat, seed,
                            allow_random_fallback=allow_random_fallback,
                            require_tokenizer=require_tokenizer)

    # ConvNeXt-CLIP family (LAION open_clip tags / HF repo names).
    # ``random:<tag>`` resolves through the standard random branch below
    # (the tag grid registers into CLIP_ARCHS on import).
    if ("convnext" in plain.lower() and random_cfg is None
            and not name.startswith("random:")):
        return _load_convnext(name, dtype, param_dtype, remat, seed,
                              cache_root,
                              allow_random_fallback=allow_random_fallback)

    # 4) random-init dev model
    if name.startswith("random:"):
        arch = name.split(":", 1)[1]
        cfg = random_cfg or CLIP_ARCHS[arch]
        model = CLIPModel(cfg, dtype=dtype, param_dtype=param_dtype, remat=remat)
        variables = model.init(
            jax.random.key(seed),
            jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
            jnp.zeros((1, cfg.context_length), jnp.int32),
        )
        return CLIPBundle(name=name, config=cfg, model=model,
                          params=variables["params"], source="random")

    # 1) converted npz cache
    npz = _npz_cache_path(name, cache_root)
    cfg_path = _config_cache_path(name, cache_root)
    if npz.is_file() and cfg_path.is_file():
        cfg = _load_config(cfg_path)
        params = load_params_npz(npz)
        params = cast_params(params, param_dtype)
        model = CLIPModel(cfg, dtype=dtype, param_dtype=param_dtype, remat=remat)
        return CLIPBundle(name=name, config=cfg, model=model, params=params,
                          source="npz-cache")

    # 2) local torch checkpoint path / 3) zoo download
    source = "torch"
    if os.path.isfile(name):
        ckpt = Path(name)
    elif name in _ZOO_URLS:
        if not download:
            raise FileNotFoundError(
                f"No cached conversion for '{name}' and download=False")
        ckpt = download_checkpoint(name, cache_root / "checkpoints")
        source = "download"
    else:
        raise FileNotFoundError(
            f"Model '{name}' is neither a file, a zoo name "
            f"({available_models()}), nor 'random:<ARCH>'")

    cfg, params = _convert_torch_checkpoint(ckpt)
    npz.parent.mkdir(parents=True, exist_ok=True)
    save_params_npz(npz, params)
    _save_config(cfg_path, cfg)
    params = cast_params(params, param_dtype)
    model = CLIPModel(cfg, dtype=dtype, param_dtype=param_dtype, remat=remat)
    return CLIPBundle(name=name, config=cfg, model=model, params=params,
                      source=source)
