import numpy as np

from aihab_clip_tpu.data import make_synthetic_cs_dataset
from aihab_clip_tpu.tools.predict import main as predict_main


def test_predict_cli_end_to_end(tmp_path):
    synth = make_synthetic_cs_dataset(tmp_path, n_train_per_class=2,
                                      n_test_per_class=2, image_size=48)
    out = tmp_path / "preds.csv"
    df = predict_main([
        "--images", synth["test_dir"], "--model", "random:Tiny",
        "--out", str(out), "--batch_size", "4", "--topk", "3",
        "--resolution", "32", "--flat",
    ])
    assert out.is_file()
    # unlabeled file is still classified (prediction CLI takes every image)
    assert len(df) == 2 * 4 + 1
    assert {"file_name", "predicted_word_label", "top1_prob",
            "top3_name"} <= set(df.columns)
    probs = df[["top1_prob", "top2_prob", "top3_prob"]].to_numpy()
    assert (probs[:, 0] + 1e-6 >= probs[:, 1]).all()
    assert (probs >= 0).all() and (probs <= 1).all()


def test_predict_cli_lora_adapters(tmp_path):
    """--lora merges a saved adapter npz; nonzero adapters change the
    predicted distribution, zero adapters don't."""
    import jax

    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.train.lora import lora_init

    synth = make_synthetic_cs_dataset(tmp_path, n_train_per_class=1,
                                      n_test_per_class=1, image_size=48)
    bundle = load("random:Tiny")
    adapters = lora_init(bundle.params, 2, jax.random.key(0))
    # B starts at zero -> identity merge
    apath = tmp_path / "ad.npz"
    np.savez(apath, **{f"{k}/{n}": np.asarray(v)
                       for k, ab in adapters.items() for n, v in ab.items()})
    base = ["--images", synth["test_dir"], "--model", "random:Tiny",
            "--batch_size", "4", "--resolution", "32", "--flat"]
    df0 = predict_main(base + ["--out", str(tmp_path / "p0.csv")])
    df1 = predict_main(base + ["--out", str(tmp_path / "p1.csv"),
                               "--lora", str(apath)])
    np.testing.assert_allclose(df0["top1_prob"], df1["top1_prob"], atol=1e-6)

    nz = {k: {"a": ab["a"], "b": ab["b"] + 0.05}
          for k, ab in adapters.items()}
    np.savez(tmp_path / "nz.npz",
             **{f"{k}/{n}": np.asarray(v)
                for k, ab in nz.items() for n, v in ab.items()})
    df2 = predict_main(base + ["--out", str(tmp_path / "p2.csv"),
                               "--lora", str(tmp_path / "nz.npz")])
    assert not np.allclose(df0["top1_prob"], df2["top1_prob"], atol=1e-4)
