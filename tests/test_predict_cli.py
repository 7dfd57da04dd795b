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
