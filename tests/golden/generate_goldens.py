#!/usr/bin/env python
"""Record golden activations from the reference torch implementation.

Run where /root/reference is mounted; writes small npz files (tiny random
models, fixed seeds) that the parity tests use as oracles when the
reference itself is absent — keeping the numerics evidence standalone.
"""

import importlib.util
import pathlib
import sys

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
REF_MODEL = pathlib.Path("/root/reference/clip/model.py")


def main():
    sys.path.insert(0, str(HERE.parents[1]))
    import torch

    spec = importlib.util.spec_from_file_location("ref_clip_model", REF_MODEL)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from aihab_clip_tpu.models import torch_state_dict_to_params
    from aihab_clip_tpu.models.convert import save_params_npz

    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    tokens = np.zeros((2, 16), dtype=np.int64)
    for i in range(2):
        n = int(rng.integers(3, 15))
        tokens[i, 0] = 510
        tokens[i, 1:n] = rng.integers(1, 510, size=n - 1)
        tokens[i, n] = 511

    for name, vision_layers, vision_width, patch in (
            ("vit", 2, 128, 8), ("rn", (1, 1, 1, 1), 16, None)):
        torch.manual_seed(0)
        model = ref.CLIP(64, 32, vision_layers, vision_width, patch,
                         16, 512, 128, 2, 2).eval()
        with torch.no_grad():
            img = model.encode_image(torch.from_numpy(images)).numpy()
            pre, post = model.encode_text(torch.from_numpy(tokens))

        # the converted param tree IS part of the golden (conversion included)
        import dataclasses, json

        cfg, params = torch_state_dict_to_params(model.state_dict())
        save_params_npz(HERE / f"{name}_params.npz", params)
        np.savez(HERE / f"{name}_golden.npz",
                 images=images, tokens=tokens.astype(np.int32),
                 image_features=img, text_pre=pre.numpy(),
                 text_post=post.numpy(),
                 config=np.asarray(json.dumps(dataclasses.asdict(cfg))))
        print(f"golden '{name}': img {img.shape}, text {post.shape}")


if __name__ == "__main__":
    main()
