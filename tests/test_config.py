import pytest

from aihab_clip_tpu.config import (
    ConfigNode,
    apply_dotted_overrides,
    coerce_value_type,
    decode_value,
    get_by_dotted_path,
    load_config_file,
    load_configs,
    merge_from_pairs,
    set_by_dotted_path,
)


@pytest.fixture
def base_yaml(tmp_path):
    p = tmp_path / "base.yaml"
    p.write_text(
        "seed: 1\n"
        "lr_v: 0.00005\n"
        "shots: 0\n"
        "backbone: 'ViT-B/32'\n"
        "subset_l3: []\n"
        "finetune:\n"
        "  enabled: true\n"
        "  unlocked_groups: 11\n"
    )
    return p


@pytest.fixture
def ds_yaml(tmp_path):
    p = tmp_path / "cs.yaml"
    p.write_text(
        "data:\n"
        "  batch_size: 16\n"
        "  preprocessing:\n"
        "    resize: 439\n"
        "    resolution: 224\n"
        "seed: 7\n"
    )
    return p


def test_attr_and_item_access(base_yaml):
    cfg = load_config_file(base_yaml)
    assert cfg.seed == 1
    assert cfg["lr_v"] == pytest.approx(5e-5)
    assert cfg.finetune.unlocked_groups == 11
    assert isinstance(cfg.finetune, ConfigNode)
    assert cfg.get("missing", "dflt") == "dflt"


def test_two_layer_merge(base_yaml, ds_yaml):
    cfg = load_configs(str(base_yaml), str(ds_yaml))
    # dataset layer shallow-overrides base
    assert cfg.seed == 7
    assert cfg.data.batch_size == 16
    assert cfg.finetune.enabled is True


def test_opts_override_type_coercion(base_yaml):
    cfg = load_config_file(base_yaml)
    out = merge_from_pairs(cfg, ["seed", "5", "lr_v", "0.01"])
    assert out.seed == 5
    assert out.lr_v == pytest.approx(0.01)
    # int accepted where float expected
    out2 = merge_from_pairs(cfg, ["lr_v", "1"])
    assert out2.lr_v == 1.0 and isinstance(out2.lr_v, float)


def test_opts_override_rejects_unknown_key(base_yaml):
    cfg = load_config_file(base_yaml)
    with pytest.raises(KeyError):
        merge_from_pairs(cfg, ["nonexistent", "1"])


def test_opts_override_rejects_bad_type(base_yaml):
    cfg = load_config_file(base_yaml)
    with pytest.raises(ValueError):
        merge_from_pairs(cfg, ["seed", "'a_string'"])


def test_decode_value():
    assert decode_value("1") == 1
    assert decode_value("0.5") == 0.5
    assert decode_value("[1, 2]") == [1, 2]
    assert decode_value("True") is True
    assert decode_value("plainstring") == "plainstring"


def test_coerce_tuple_list():
    assert coerce_value_type((1, 2), [0], "k") == [1, 2]
    assert coerce_value_type([1, 2], (0,), "k") == (1, 2)


def test_dotted_path_set_get(base_yaml):
    cfg = load_config_file(base_yaml)
    set_by_dotted_path(cfg, "finetune.unlocked_groups", "3")
    assert cfg.finetune.unlocked_groups == 3
    # creates new nested keys (sweep semantic)
    set_by_dotted_path(cfg, "newblock.alpha.beta", "0.5")
    assert cfg.newblock.alpha.beta == 0.5
    assert get_by_dotted_path(cfg, "newblock.alpha.beta") == 0.5
    assert get_by_dotted_path(cfg, "no.such.key", "d") == "d"


def test_apply_dotted_overrides_is_pure(base_yaml):
    cfg = load_config_file(base_yaml)
    out = apply_dotted_overrides(cfg, [("finetune.enabled", "False")])
    assert out.finetune.enabled is False
    assert cfg.finetune.enabled is True


def test_clone_and_to_dict(base_yaml):
    cfg = load_config_file(base_yaml)
    d = cfg.to_dict()
    assert isinstance(d, dict) and not isinstance(d, ConfigNode)
    assert d["finetune"]["unlocked_groups"] == 11
    c = cfg.clone()
    c.seed = 99
    assert cfg.seed == 1


def test_opts_dotted_nested_key(tmp_path):
    from aihab_clip_tpu.config import load_configs

    cfg = load_configs("configs/base.yaml", "configs/cs.yaml",
                       ["finetune.lora_rank", "8", "lr_v", "0.01"])
    assert cfg["finetune"]["lora_rank"] == 8
    assert cfg["lr_v"] == 0.01
    # unknown dotted keys still raise (reference semantics)
    import pytest as _pytest
    with _pytest.raises(KeyError):
        load_configs("configs/base.yaml", None, ["finetune.nope", "1"])
