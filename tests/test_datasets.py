"""Dataset layer: real example CSVs from the reference, op DSL, viz overlay."""

import os

import numpy as np
import pytest

from goal_force_tpu.data import ops
from goal_force_tpu.data.datasets import (
    BallsDataset,
    ConcatDataset,
    safe_collate,
    should_skip,
)
from goal_force_tpu.data.viz import add_force_prompt_to_video

from conftest import reference_available

EXAMPLES = "/root/reference/datasets/examples/animal-object-interaction"


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_balls_validation_on_reference_example_csv():
    csvs = [f for f in os.listdir(EXAMPLES) if f.endswith(".csv")]
    csv = os.path.join(EXAMPLES, sorted(csvs)[0])
    ds = BallsDataset(EXAMPLES, csv, is_validation_dataset=True,
                      num_frames=9, height=480, width=832)
    ds.set_calibration(30.0, 400.0, 1.0, 4.0)
    assert len(ds) >= 1
    sample = ds[0]
    assert sample is not None
    assert sample["video"].shape == (1, 480, 832, 3)
    assert sample["control_video"].shape == (9, 480, 832, 3)
    assert 0.0 <= sample["control_video"].min() and sample["control_video"].max() <= 1.0
    assert isinstance(sample["prompt"], str) and len(sample["prompt"]) > 0
    assert not should_skip(sample, 9, 480, 832)
    # force -1 in this CSV masks the direct channel
    if sample["spec"].force == -1:
        assert np.all(sample["control_video"][..., 0] == 0)


def test_safe_collate_and_skip():
    assert safe_collate([None, None]) is None
    assert safe_collate([None, {"a": 1}]) == {"a": 1}
    assert should_skip(None, 9, 8, 8)
    bad = {"control_video": np.zeros((5, 8, 8, 3))}
    assert should_skip(bad, 9, 8, 8)


def test_concat_dataset_indexing():
    class Fake:
        def __init__(self, tag, n):
            self.tag, self.n = tag, n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return (self.tag, i)

    ds = ConcatDataset([Fake("a", 2), Fake("b", 3)])
    assert len(ds) == 5
    assert ds[0] == ("a", 0) and ds[1] == ("a", 1)
    assert ds[2] == ("b", 0) and ds[4] == ("b", 2)


def test_op_dsl_compose(tmp_path):
    from PIL import Image

    img_path = tmp_path / "x.png"
    Image.fromarray(np.zeros((37, 53, 3), np.uint8)).save(img_path)
    op = ops.ToAbsolutePath(str(tmp_path)) >> ops.LoadImage() >> ops.ImageCropAndResize(32, 48)
    out = op("x.png")
    assert out.size == (48, 32)
    routed = ops.RouteByType([(str, op), (list, ops.SequencialProcess(op))])
    assert routed("x.png").size == (48, 32)
    assert [im.size for im in routed(["x.png", "x.png"])] == [(48, 32), (48, 32)]


def test_route_by_extension(tmp_path):
    from PIL import Image

    p = tmp_path / "y.webp"
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(p)
    op = ops.RouteByExtensionName([
        (("jpg", "jpeg", "png", "webp"), ops.LoadImage() >> ops.ToList()),
    ])
    out = op(str(p))
    assert isinstance(out, list) and out[0].size == (16, 16)
    with pytest.raises(ValueError):
        op("z.xyz")


def test_viz_overlay_changes_first_frames_only():
    video = np.full((4, 64, 64, 3), 0.5, np.float32)
    out = add_force_prompt_to_video(video, 0.5, 45.0, 0.5, 0.5,
                                    num_frames_with_signal=2, color=(255, 0, 0))
    assert np.abs(out[0] - video[0]).max() > 0
    assert np.abs(out[1] - video[1]).max() > 0
    np.testing.assert_array_equal(out[2], video[2])


def test_unified_dataset_csv(tmp_path):
    import pandas

    pandas.DataFrame([{"prompt": "hi", "video": "a.mp4"}]).to_csv(tmp_path / "m.csv", index=False)
    ds = ops.UnifiedDataset(metadata_path=str(tmp_path / "m.csv"), data_file_keys=(),
                            repeat=2)
    assert len(ds) == 2
    assert ds[1]["prompt"] == "hi"


def test_text_image_dataset(tmp_path):
    """metadata.csv folder -> cover-resize, crop, [-1,1] (simple_text_image.py)."""
    from PIL import Image

    from goal_force_tpu.data.datasets import TextImageDataset

    d = tmp_path / "train"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (40 + 8 * i, 64, 3), np.uint8)).save(
            d / f"img{i}.png")
    (d / "metadata.csv").write_text(
        "file_name,text\n" + "\n".join(f"img{i}.png,caption {i}" for i in range(3)))

    ds = TextImageDataset(str(tmp_path), steps_per_epoch=5, height=32, width=32,
                          center_crop=True, seed=1)
    assert len(ds) == 5
    for i in range(5):
        item = ds[i]
        assert item["image"].shape == (32, 32, 3)
        assert -1.0 <= item["image"].min() and item["image"].max() <= 1.0
        assert item["text"].startswith("caption")
    # deterministic under a fixed seed (fresh random draw per item, as the
    # reference does with torch.randint + index offset)
    a = [TextImageDataset(str(tmp_path), steps_per_epoch=5, height=32, width=32,
                          seed=7)[i]["text"] for i in range(5)]
    b = [TextImageDataset(str(tmp_path), steps_per_epoch=5, height=32, width=32,
                          seed=7)[i]["text"] for i in range(5)]
    assert a == b
