"""linemod_datacfg parity with the reference's 13 per-object .data files."""

import os

import pytest

from singleshotpose_tpu.config import data_config_from_options, read_data_cfg
from singleshotpose_tpu.zoo import LINEMOD_OBJECTS, linemod_datacfg


def test_all_13_objects_match_reference(reference_dir, tmp_path):
    for obj in LINEMOD_OBJECTS:
        p = tmp_path / f"{obj}.data"
        p.write_text(linemod_datacfg(obj))
        ours = data_config_from_options(read_data_cfg(str(p)))
        ref = data_config_from_options(read_data_cfg(
            os.path.join(reference_dir, "cfg", f"{obj}.data")))
        assert ours.diam == ref.diam, obj
        assert (ours.fx, ours.fy, ours.u0, ours.v0) == \
            (ref.fx, ref.fy, ref.u0, ref.v0), obj
        assert (ours.width, ours.height) == (ref.width, ref.height), obj
        assert ours.name == ref.name, obj


def test_unknown_object_rejected():
    with pytest.raises(ValueError):
        linemod_datacfg("teapot")
