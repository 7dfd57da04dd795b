"""Prompt templates and prompt-ensemble generation for the CS habitat classes.

Capability parity with `/root/reference/data/templates.py`: the *prompt
strings* (templates + per-class descriptive attributes) are dataset-tuned
text and must match the reference exactly for zero-shot accuracy parity;
the generation logic is re-implemented around a single attribute table.

Prompt modes (selected via ``gen_prompts``):
  * flat:            "a habitat photo of {l3}."
  * hierarchical:    "a habitat photo of {l2}, specifically {l3}"
  * descriptive:     the above plus ", attr, attr, attr, attr" when the class
                     has a descriptive attribute entry.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from .taxonomy import (
    CS_CLASSNAMES,
    L2_NAMES,
    REASSIGN_NAME_LABEL_L3L2,
)

# Flat prompt ensemble (one active template; the commented alternatives in the
# reference are intentionally not carried over — they were disabled there too).
CS_TEMPLATES: List[str] = [
    "a habitat photo of {}.",
]

# Hierarchical (L2 + L3) base templates.
CS_HIER_TEMPLATES: List[str] = [
    "a habitat photo of {l2}, specifically {l3}",
]

# Descriptive template variants (attrs appended).
DESC_TEMPLATES: List[str] = [
    "a habitat photo of {habitat}, {attrs}",
]

HIER_DESC_TEMPLATES: List[str] = [
    "a habitat photo of {l2}, specifically {l3}, {attrs}",
]

# Per-class descriptive attributes (ordered attr -> phrase).  Values are the
# exact phrases used by the reference prompt set.
DESCRIPTIVE_L3_ATTRS: Dict[str, Dict[str, str]] = {
    "Improved Grassland": {
        "vegetation_height": "short to medium vegetation height",
        "sward_texture": "very even close-cropped sward",
        "dominant_cover": "grass-dominated",
        "forb_richness": "few forbs",
    },
    "Neutral Grassland": {
        "vegetation_height": "medium to tall vegetation height",
        "sward_texture": "mixed uneven meadow sward",
        "dominant_cover": "herbs-dominated",
        "forb_richness": "moderate to high forbs",
    },
    "Calcareous Grassland": {
        "vegetation_height": "short vegetation height",
        "sward_texture": "close-cropped open turf",
        "dominant_cover": "fine grasses and herbs dominated",
        "forb_richness": "high forb richness",
    },
    "Acid Grassland": {
        "vegetation_height": "short to medium vegetation height",
        "sward_texture": "patchy or tussocky sward",
        "dominant_cover": "fine grasses dominated",
        "forb_richness": "low to moderate forbs",
    },
    "Bracken": {
        "vegetation_height": "tall vegetation height",
        "sward_texture": "dense canopy of fronds",
        "dominant_cover": "bracken fronds",
        "forb_richness": "low forb richness",
    },
    "Fen, Marsh, Swamp": {
        "vegetation_structure": "tall emergent wetland herbs and sedges",
        "dominant_cover": "sedges, rushes, reeds and wetland herbs",
        "surface_texture": "dense emergent cover with wet channels or patches",
        "water_level": "waterlogged to shallowly inundated",
    },
    "Bog": {
        "vegetation_structure": "low open mossy vegetation with scattered dwarf shrubs",
        "dominant_cover": "bog-moss and cotton-grass",
        "surface_texture": "hummocky surface with small wet hollows",
        "water_level": "persistently waterlogged",
    },
    "Dwarf Shrub Heath": {
        "vegetation_height": "low dwarf shrubs (<1.5 m)",
        "vegetation_structure": "dwarf-shrub dominated, low woody canopy",
        "dominant_cover": "heather/ericoids and dwarf gorse",
        "surface_texture": "patchy heather with moss/lichen and bare ground",
    },
    "Arable and Horticulture": {
        "vegetation_structure": "regular planted rows or plots with uniform spacing",
        "dominant_cover": "arable crops or horticultural plantings",
        "surface_texture": "tilled or ploughed soil with furrows and stubble",
        "management_cue": "actively cultivated or rotational fallow",
    },
    "Broadleaved Mixed and Yew Woodland": {
        "canopy_structure": "tall broadleaved canopy, irregular and layered",
        "foliage_type": "broad leaves with some evergreen yew",
        "understory_light": "dappled light through mixed canopy",
        "ground_cover": "leaf-littered forest floor",
    },
    "Coniferous Woodland": {
        "canopy_structure": "tall conifer canopy, often uniform or plantation-like",
        "foliage_type": "needle-leaved evergreen conifers",
        "understory_light": "darker, more shaded understory",
        "ground_cover": "needle litter with sparse ground vegetation or moss",
    },
    "Littoral Rock": {
        "substrate_type": "exposed rock platforms or boulder shores",
        "surface_texture": "hard, uneven rock with crevices and pools",
        "dominant_cover": "bare rock with algal and barnacle encrustation",
        "tidal_influence": "intertidal, regularly wetted and exposed",
    },
    "Littoral Sediment": {
        "substrate_type": "sand, mud or gravel flats",
        "surface_texture": "flat, soft sediment with ripples",
        "dominant_cover": "mostly bare sediment with sparse algal film",
        "tidal_influence": "intertidal flats, regularly inundated and exposed",
    },
    "Montane": {
        "vegetation_structure": "low wind-clipped vegetation above treeline",
        "dominant_cover": "dwarf shrubs with moss, lichen and short grasses",
        "surface_texture": "rocky ground with thin soils and bare patches",
        "exposure_cue": "open, treeless, exposed upland ridges",
    },
    "Standing Open Waters and Canals": {
        "water_body_form": "open water body or straight canal",
        "water_surface": "still or slow-moving open water",
        "bank_structure": "defined banks or engineered canal edges",
        "aquatic_vegetation": "floating or submerged plants with narrow fringe",
    },
    "Inland Rock": {
        "substrate_type": "exposed inland rock, cliffs or scree",
        "surface_texture": "hard rock faces with fissures and ledges",
        "dominant_cover": "mostly bare rock with sparse crevice plants",
        "exposure_cue": "dry, wind-exposed inland slopes",
    },
    "Supra-littoral Rock": {
        "substrate_type": "coastal rock above the high-tide line",
        "surface_texture": "rugged rock with spray-wet surfaces",
        "dominant_cover": "salt-tolerant lichens or algae, sparse vegetation",
        "exposure_cue": "wave-splash zone with salt spray",
    },
    "Supra-littoral Sediment": {
        "substrate_type": "coastal sand, shingle or pebbles",
        "surface_texture": "loose granular sediment with ridges",
        "dominant_cover": "sparse salt-tolerant pioneer plants",
        "exposure_cue": "above high tide, exposed to spray and wind",
    },
    "Urban": {
        "built_form": "dense built structures, walls and roofs",
        "surface_material": "sealed hard surfaces like concrete or asphalt",
        "vegetation_cover": "little vegetation or small landscaped patches",
        "infrastructure_cue": "roads, kerbs, fences or utilities",
    },
    "Sea": {
        "water_body_form": "open marine water to the horizon",
        "surface_texture": "rolling waves or choppy surface",
        "dominant_cover": "open water with minimal vegetation",
        "coastal_context": "distant coastline or open sea view",
    },
}

_ID_NAME_L2 = {i: n for i, n in enumerate(L2_NAMES)}


def _format_attrs(attrs: Dict[str, str]) -> str:
    return ", ".join(attrs.values())


def gen_prompts(
    use_hierarchy: bool = True,
    use_descriptive: bool = True,
    verbose: bool = False,
) -> Tuple[List[str], int]:
    """Build the flattened [class x template] prompt list.

    Returns (prompts, templates_per_class) where ``prompts`` is ordered by
    L3 class id (outer) then template (inner).
    """
    if use_hierarchy:
        base_templates = CS_HIER_TEMPLATES
        desc_templates = HIER_DESC_TEMPLATES
    else:
        base_templates = CS_TEMPLATES
        desc_templates = DESC_TEMPLATES

    if use_descriptive and len(base_templates) != len(desc_templates):
        raise ValueError(
            "Descriptive templates enabled but template counts differ: "
            f"{len(desc_templates)} (descriptive) vs {len(base_templates)} (base). "
            "Please make them consistent."
        )

    templates_per_class = len(desc_templates) if use_descriptive else len(base_templates)

    prompts: List[str] = []
    for l3 in CS_CLASSNAMES:
        l3_clean = l3.replace("_", " ")
        l2 = None
        if use_hierarchy:
            _, l2_id = REASSIGN_NAME_LABEL_L3L2[l3]
            l2 = _ID_NAME_L2[l2_id]
        attrs = DESCRIPTIVE_L3_ATTRS.get(l3_clean) if use_descriptive else None

        class_prompts: List[str] = []
        if attrs is not None:
            attrs_text = _format_attrs(attrs)
            for tmpl in desc_templates:
                if use_hierarchy:
                    class_prompts.append(tmpl.format(l2=l2, l3=l3_clean, attrs=attrs_text))
                else:
                    class_prompts.append(tmpl.format(habitat=l3_clean, attrs=attrs_text))
        else:
            for tmpl in base_templates:
                if use_hierarchy:
                    class_prompts.append(tmpl.format(l3=l3_clean, l2=l2))
                else:
                    class_prompts.append(tmpl.format(l3_clean))

        if verbose and use_descriptive:
            preview = class_prompts[: min(2, len(class_prompts))]
            print(f"[gen_prompts] {l3_clean}: {preview}")

        prompts.extend(class_prompts)

    return prompts, templates_per_class
