"""OpenPose body annotator: golden network parity + decode behavior.

The reference's Annotator("openpose") wraps controlnet_aux's OpenposeDetector
(diffsynth/controlnets/processors.py:26-28); its body branch is the two-branch
CPM network shipped as body_pose_model.pth. controlnet_aux is not installed
here, so the torch side is reconstructed from the checkpoint's flat layer
names with random weights; the converter must reproduce the network exactly.
The PAF decode is exercised on synthetic maps with known ground truth.
"""

import numpy as np
import pytest

import jax

from goal_force_tpu.extensions.openpose import (LIMB_SEQ, MAP_IDX,
                                                body_forward,
                                                body_params_from_torch,
                                                decode_body_maps,
                                                draw_bodypose,
                                                init_openpose_body,
                                                openpose_annotate)

torch = pytest.importorskip("torch")
nn = torch.nn


def _build_torch_body():
    """The body_pose_model layout: flat named conv layers, ReLU after every
    conv except each branch's final 1x1 output."""
    import collections

    def convs(plan, final_no_relu=True):
        layers = collections.OrderedDict()
        for i, item in enumerate(plan):
            if item == "pool":
                layers[f"pool_{i}"] = nn.MaxPool2d(2, 2)
                continue
            name, ci, co, k = item
            layers[name] = nn.Conv2d(ci, co, k, padding=k // 2)
            is_last = i == len(plan) - 1
            if not (final_no_relu and is_last):
                layers["relu_" + name] = nn.ReLU()
        return nn.Sequential(layers)

    from goal_force_tpu.extensions.openpose import _TRUNK, _stage_plan

    class Body(nn.Module):
        def __init__(self):
            super().__init__()
            self.trunk = convs(_TRUNK, final_no_relu=False)
            for s in range(1, 7):
                for br in ("L1", "L2"):
                    setattr(self, f"s{s}{br}", convs(_stage_plan(s, br)))

        def forward(self, x):
            t = self.trunk(x)
            paf, heat = self.s1L1(t), self.s1L2(t)
            for s in range(2, 7):
                inp = torch.cat([paf, heat, t], dim=1)
                paf = getattr(self, f"s{s}L1")(inp)
                heat = getattr(self, f"s{s}L2")(inp)
            return paf, heat

    return Body().eval()


def _flat_sd(model):
    """state dict with the checkpoint's flat keys (conv name only)."""
    out = {}
    for k, v in model.state_dict().items():
        out[k.split(".", 1)[1]] = v.numpy()
    return out


def test_openpose_body_golden_parity():
    torch.manual_seed(0)
    ref = _build_torch_body()
    sd = _flat_sd(ref)
    params = body_params_from_torch(sd)
    with pytest.raises(ValueError, match="unconsumed"):
        body_params_from_torch({**sd, "bogus.k": sd["conv1_1.bias"]})

    img = np.random.default_rng(0).uniform(-0.5, 0.5, (1, 16, 24, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        want_paf, want_heat = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    paf, heat = body_forward(params, img)
    assert paf.shape == (1, 2, 3, 38) and heat.shape == (1, 2, 3, 19)
    np.testing.assert_allclose(np.asarray(paf), want_paf.numpy()
                               .transpose(0, 2, 3, 1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(heat), want_heat.numpy()
                               .transpose(0, 2, 3, 1), atol=3e-5)


def _synthetic_person(h, w, joints):
    """Build heat/paf maps encoding one person with the given part -> (x, y)
    dict (1-based part ids)."""
    heat = np.zeros((h, w, 19), np.float32)
    paf = np.zeros((h, w, 38), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for part, (x, y) in joints.items():
        heat[:, :, part - 1] = np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / 18.0)
    for (a, b), (m1, m2) in zip(LIMB_SEQ, MAP_IDX):
        if a in joints and b in joints:
            (x1, y1), (x2, y2) = joints[a], joints[b]
            vec = np.array([x2 - x1, y2 - y1], np.float32)
            vec /= max(np.hypot(*vec), 1e-8)
            # paint the PAF in a broad band around the segment
            t = ((xx - x1) * (x2 - x1) + (yy - y1) * (y2 - y1))
            t /= max((x2 - x1) ** 2 + (y2 - y1) ** 2, 1e-8)
            t = np.clip(t, 0, 1)
            px, py = x1 + t * (x2 - x1), y1 + t * (y2 - y1)
            band = (np.hypot(xx - px, yy - py) < 4.0)
            paf[:, :, m1] += band * vec[0]
            paf[:, :, m2] += band * vec[1]
    return heat, paf


def test_decode_recovers_synthetic_person():
    joints = {1: (40, 12), 2: (40, 24), 3: (30, 24), 4: (26, 40),
              6: (50, 24), 7: (54, 40), 9: (34, 48), 12: (46, 48)}
    heat, paf = _synthetic_person(64, 80, joints)
    candidate, subset = decode_body_maps(heat, paf)
    assert len(subset) == 1
    person = subset[0]
    assert person[-1] == len(joints)  # every painted part assembled
    for part, (x, y) in joints.items():
        idx = int(person[part - 1])
        assert idx >= 0
        px, py = candidate[idx, 0:2]
        assert abs(px - x) <= 1 and abs(py - y) <= 1
    canvas = draw_bodypose(np.zeros((64, 80, 3), np.uint8), candidate, subset)
    assert canvas.sum() > 0


def test_decode_rejects_sparse_person():
    """A person with <4 parts is dropped (the reference deleteIdx rule)."""
    heat, paf = _synthetic_person(64, 80, {1: (40, 12), 2: (40, 24)})
    _, subset = decode_body_maps(heat, paf)
    assert len(subset) == 0


def test_openpose_annotator_wiring(tmp_path):
    from safetensors.numpy import save_file

    from goal_force_tpu.controlnets import Annotator

    torch.manual_seed(1)
    sd = _flat_sd(_build_torch_body())
    path = tmp_path / "body_pose_model.safetensors"
    save_file(sd, str(path))
    ann = Annotator("openpose", weights_path=str(path))
    img = np.random.default_rng(1).integers(0, 255, (48, 64, 3), np.uint8)
    out = ann(img)
    assert out.shape == (48, 64, 3) and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_openpose_annotate_random_weights_runs():
    params = init_openpose_body(jax.random.PRNGKey(0))
    img = np.random.default_rng(2).integers(0, 255, (40, 56, 3), np.uint8)
    out = openpose_annotate(params, img)
    assert out.shape == (40, 56, 3) and out.dtype == np.uint8


# ---------------------------------------------------------------------------
# hand branch

def _build_torch_hand():
    import collections

    from goal_force_tpu.extensions.openpose import (_HAND_TRUNK,
                                                    _hand_stage_plan)

    def convs(plan, final_no_relu=True):
        layers = collections.OrderedDict()
        for i, item in enumerate(plan):
            if item == "pool":
                layers[f"pool_{i}"] = nn.MaxPool2d(2, 2)
                continue
            name, ci, co, k = item
            layers[name] = nn.Conv2d(ci, co, k, padding=k // 2)
            if not (final_no_relu and i == len(plan) - 1):
                layers["relu_" + name] = nn.ReLU()
        return nn.Sequential(layers)

    class Hand(nn.Module):
        def __init__(self):
            super().__init__()
            self.trunk = convs(_HAND_TRUNK, final_no_relu=False)
            for s in range(1, 7):
                setattr(self, f"s{s}", convs(_hand_stage_plan(s)))

        def forward(self, x):
            feat = self.trunk(x)
            out = self.s1(feat)
            for s in range(2, 7):
                out = getattr(self, f"s{s}")(torch.cat([out, feat], dim=1))
            return out

    return Hand().eval()


def test_openpose_hand_golden_parity():
    from goal_force_tpu.extensions.openpose import (hand_forward,
                                                    hand_params_from_torch)

    torch.manual_seed(3)
    ref = _build_torch_hand()
    sd = _flat_sd(ref)
    params = hand_params_from_torch(sd)
    with pytest.raises(ValueError, match="unconsumed"):
        hand_params_from_torch({**sd, "bogus.k": sd["conv1_1.bias"]})

    img = np.random.default_rng(3).uniform(-0.5, 0.5, (1, 16, 24, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    got = hand_forward(params, img)
    assert got.shape == (1, 2, 3, 22)
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 1), atol=3e-5)


def test_hand_detect_boxes_from_body():
    from goal_force_tpu.extensions.openpose import hand_detect

    # one person with a full right arm (0-based columns 2/3/4 =
    # RShoulder/RElbow/RWrist, the reference person[[2,3,4]]) and no left arm
    candidate = np.array([[40, 10, 0.9, 0], [40, 30, 0.9, 1],
                          [60, 50, 0.9, 2]], np.float32)
    person = -1 * np.ones(20, np.float32)
    person[[2, 3, 4]] = [0, 1, 2]
    boxes = hand_detect(candidate, np.array([person]), (128, 128))
    assert len(boxes) == 1
    x, y, w, is_left = boxes[0]
    assert not is_left and w >= 20
    # the box contains the extrapolated point past the wrist
    ex, ey = 60 + 0.33 * 20, 50 + 0.33 * 20
    assert x <= ex <= x + w and y <= ey <= y + w


def test_hand_estimate_recovers_synthetic_peak():
    from goal_force_tpu.extensions.openpose import (draw_handpose,
                                                    hand_estimate,
                                                    init_openpose_hand)

    params = init_openpose_hand(jax.random.PRNGKey(1))
    img = np.random.default_rng(4).integers(0, 255, (48, 48, 3), np.uint8)
    peaks = hand_estimate(params, img)
    assert peaks.shape == (21, 2)
    canvas = draw_handpose(np.zeros((48, 48, 3), np.uint8), peaks)
    assert canvas.shape == (48, 48, 3)


def test_openpose_annotator_with_hand_wiring(tmp_path):
    from safetensors.numpy import save_file

    from goal_force_tpu.controlnets import Annotator

    torch.manual_seed(5)
    save_file(_flat_sd(_build_torch_body()),
              str(tmp_path / "body.safetensors"))
    save_file(_flat_sd(_build_torch_hand()),
              str(tmp_path / "hand.safetensors"))
    ann = Annotator("openpose", weights_path=str(tmp_path / "body.safetensors"),
                    hand_weights_path=str(tmp_path / "hand.safetensors"))
    img = np.random.default_rng(5).integers(0, 255, (48, 64, 3), np.uint8)
    out = ann(img)
    assert out.shape == (48, 64, 3) and out.dtype == np.float32


# ---------------------------------------------------------------------------
# face branch (same CPM topology, 71 maps — facenet.pth)

def test_openpose_face_golden_parity():
    from goal_force_tpu.extensions.openpose import (face_forward,
                                                    face_params_from_torch)

    class Face(nn.Module):
        def __init__(self):
            super().__init__()
            import collections

            from goal_force_tpu.extensions.openpose import (_HAND_TRUNK,
                                                            _hand_stage_plan)

            def convs(plan, final_no_relu=True):
                layers = collections.OrderedDict()
                for i, item in enumerate(plan):
                    if item == "pool":
                        layers[f"pool_{i}"] = nn.MaxPool2d(2, 2)
                        continue
                    name, ci, co, k = item
                    layers[name] = nn.Conv2d(ci, co, k, padding=k // 2)
                    if not (final_no_relu and i == len(plan) - 1):
                        layers["relu_" + name] = nn.ReLU()
                return nn.Sequential(layers)

            self.trunk = convs(_HAND_TRUNK, final_no_relu=False)
            for s in range(1, 7):
                setattr(self, f"s{s}", convs(_hand_stage_plan(s, 71)))

        def forward(self, x):
            feat = self.trunk(x)
            out = self.s1(feat)
            for s in range(2, 7):
                out = getattr(self, f"s{s}")(torch.cat([out, feat], dim=1))
            return out

    torch.manual_seed(6)
    ref = Face().eval()
    sd = _flat_sd(ref)
    params = face_params_from_torch(sd)
    img = np.random.default_rng(6).uniform(-0.5, 0.5, (1, 16, 16, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    got = face_forward(params, img)
    assert got.shape == (1, 2, 2, 71)
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 1), atol=3e-5)


def test_face_detect_boxes_from_body():
    from goal_force_tpu.extensions.openpose import face_detect

    # nose + left eye -> box width 2 * 3 * max(|dx|, |dy|)
    candidate = np.array([[60, 60, 0.9, 0], [66, 55, 0.9, 1]], np.float32)
    person = -1 * np.ones(20, np.float32)
    person[0], person[14] = 0, 1  # nose (part 1), left eye (part 15)
    boxes = face_detect(candidate, np.array([person]), (200, 200))
    assert len(boxes) == 1
    x, y, size = boxes[0]
    assert x == 60 - 18 and y == 60 - 18 and size == 36
    # no nose -> no box
    person2 = person.copy(); person2[0] = -1
    assert face_detect(candidate, np.array([person2]), (200, 200)) == []


def test_face_estimate_and_draw():
    from goal_force_tpu.extensions.openpose import (draw_facepose,
                                                    face_estimate,
                                                    init_openpose_face)

    params = init_openpose_face(jax.random.PRNGKey(2))
    img = np.random.default_rng(7).integers(0, 255, (40, 40, 3), np.uint8)
    peaks = face_estimate(params, img, input_size=48)
    assert peaks.shape == (70, 2)
    canvas = draw_facepose(np.zeros((40, 40, 3), np.uint8), peaks)
    assert canvas.shape == (40, 40, 3)
