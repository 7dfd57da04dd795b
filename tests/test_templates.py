from aihab_clip_tpu.taxonomy import CS_CLASSNAMES
from aihab_clip_tpu.templates import (
    CS_TEMPLATES,
    DESCRIPTIVE_L3_ATTRS,
    gen_prompts,
)


def test_flat_prompts():
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    assert tpc == 1
    assert len(prompts) == 20
    assert prompts[0] == "a habitat photo of Urban."
    assert prompts[5] == "a habitat photo of Improved Grassland."


def test_hierarchical_prompts():
    prompts, tpc = gen_prompts(use_hierarchy=True, use_descriptive=False)
    assert len(prompts) == 20 * tpc
    assert prompts[5] == "a habitat photo of Grassland, specifically Improved Grassland"
    assert prompts[3] == "a habitat photo of Sea, specifically Sea"


def test_descriptive_prompts():
    prompts, tpc = gen_prompts(use_hierarchy=True, use_descriptive=True)
    assert len(prompts) == 20 * tpc
    ig = prompts[5]
    assert ig.startswith(
        "a habitat photo of Grassland, specifically Improved Grassland, ")
    assert "very even close-cropped sward" in ig
    assert "grass-dominated" in ig


def test_descriptive_flat_prompts():
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=True)
    assert prompts[12].startswith("a habitat photo of Bog, ")
    assert "bog-moss and cotton-grass" in prompts[12]


def test_every_class_has_descriptive_attrs():
    # all 20 L3 classes carry a 4-attribute descriptive entry
    for name in CS_CLASSNAMES:
        attrs = DESCRIPTIVE_L3_ATTRS[name]
        assert len(attrs) == 4


def test_prompt_ordering_matches_classnames():
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    for i, name in enumerate(CS_CLASSNAMES):
        assert name in prompts[i * tpc]


def test_templates_constant():
    assert CS_TEMPLATES == ["a habitat photo of {}."]
