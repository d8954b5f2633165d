"""Named scene registry + SDF material presets (reference scripts/
scenes.py). Paths resolve against the data roots below."""

import os
from pathlib import Path

DATA_ROOTS = [
    Path(os.environ.get("NGP_DATA_ROOT", "")),
    Path("/root/reference/data"),
    Path(__file__).resolve().parent.parent / "data",
]


def resolve(relpath: str) -> str:
    for root in DATA_ROOTS:
        if root and (root / relpath).exists():
            return str(root / relpath)
    return relpath


scenes_nerf = {
    "fox": {"data_path": resolve("nerf/fox"), "dataset": "transforms.json"},
    "lego": {"data_path": resolve("nerf/lego"), "dataset": "transforms_train.json",
             "test_dataset": "transforms_test.json"},
}

scenes_image = {
    "albert": {"data_path": resolve("image/albert.exr")},
    "tokyo": {"data_path": resolve("image/tokyo.bin")},
}

scenes_sdf = {
    "armadillo": {"data_path": resolve("sdf/armadillo.obj"), "brdf": {"metallic": 0.0, "roughness": 0.3}},
    "bunny": {"data_path": resolve("sdf/bunny.obj"), "brdf": {"metallic": 0.0, "roughness": 0.5}},
}

scenes_volume = {
    "cloud": {"data_path": resolve("volume/wdas_cloud_quarter.nvdb")},
}


def get_scene(name: str):
    for registry in (scenes_nerf, scenes_image, scenes_sdf, scenes_volume):
        if name in registry:
            return registry[name]
    return None
