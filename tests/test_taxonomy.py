import numpy as np
import pytest

from aihab_clip_tpu import taxonomy as tx


def test_l3_space_shape():
    assert tx.NUM_L3 == 20
    assert tx.NUM_L2 == 11
    assert len(tx.CS_CLASSNAMES) == 20
    assert tx.CS_CLASSNAMES[0] == "Urban"
    assert tx.CS_CLASSNAMES[5] == "Improved Grassland"
    assert tx.CS_CLASSNAMES[19] == "Supra-littoral Sediment"


def test_reassign_maps_consistent():
    for i, name in tx.REASSIGN_LABEL_NAME_L3.items():
        assert tx.REASSIGN_NAME_LABEL_L3[name] == i
        l3_id, l2_id = tx.REASSIGN_NAME_LABEL_L3L2[name]
        assert l3_id == i
        assert 0 <= l2_id < tx.NUM_L2


def test_expected_l3_l2_pairs():
    # spot checks against the reference label space
    assert tx.REASSIGN_NAME_LABEL_L3L2["Urban"] == (0, 0)
    assert tx.REASSIGN_NAME_LABEL_L3L2["Sea"] == (3, 9)
    assert tx.REASSIGN_NAME_LABEL_L3L2["Acid Grassland"] == (8, 3)
    assert tx.REASSIGN_NAME_LABEL_L3L2["Standing Open Waters and Canals"] == (16, 8)
    assert tx.REASSIGN_NAME_LABEL_L3L2["Supra-littoral Sediment"] == (19, 7)


def test_original_ids_roundtrip():
    assert tx.ORIGINAL_NAME_LABEL_L3["Urban"] == 17
    assert tx.ORIGINAL_NAME_LABEL_L3["Sea"] == 22
    assert tx.ORIGINAL_LABEL_NAME_L3[1] == "Broadleaved Mixed and Yew Woodland"


def test_build_l3_to_l2_map():
    l3_to_l2, l2_names = tx.build_l3_to_l2_map()
    assert len(l3_to_l2) == 20
    assert l2_names == tx.L2_NAMES
    assert l3_to_l2[0] == 0          # Urban -> Urban
    assert l3_to_l2[1] == 1          # Broadleaved -> Woodland and Forest
    assert l3_to_l2[3] == 9          # Sea -> Sea
    assert l3_to_l2[5:10] == [3, 3, 3, 3, 3]  # grasslands + bracken
    arr = tx.l3_to_l2_array()
    assert arr.dtype == np.int32
    np.testing.assert_array_equal(arr, np.array(l3_to_l2))


def test_l2_names_to_l3():
    names, ids = tx.l2_names_to_l3(["Grassland"])
    assert ids == [5, 6, 7, 8, 9]
    assert names[0] == "Improved Grassland"
    # case-insensitive
    names2, ids2 = tx.l2_names_to_l3(["grassland", "WETLAND"])
    assert ids2 == [5, 6, 7, 8, 9, 11, 12]
    assert tx.l2_names_to_l3([]) == ([], [])
    with pytest.raises(ValueError):
        tx.l2_names_to_l3(["NotALabel"])


def test_l3_values_to_ids():
    names, ids = tx.l3_values_to_ids(["Bog", 5, "7"])
    assert ids == [5, 7, 12]
    assert names == ["Improved Grassland", "Calcareous Grassland", "Bog"]
    # scalar input
    _, ids2 = tx.l3_values_to_ids("urban")
    assert ids2 == [0]
    assert tx.l3_values_to_ids(None) == ([], [])
    assert tx.l3_values_to_ids([]) == ([], [])
    with pytest.raises(ValueError):
        tx.l3_values_to_ids(["nope"])
    with pytest.raises(ValueError):
        tx.l3_values_to_ids([99])


def test_convert_to_coarse_label():
    assert tx.convert_to_coarse_label("Bog") == 5
    assert tx.convert_to_coarse_label("Urban") == 0
    assert tx.convert_to_coarse_label("unknown") == -1
