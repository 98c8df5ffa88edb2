"""OpenPose body-pose annotator (learned, checkpoint-loadable).

The reference's Annotator("openpose") wraps controlnet_aux's OpenposeDetector
(reference: diffsynth/controlnets/processors.py:26-28), whose body branch is
the classic two-branch CPM network distributed as ``body_pose_model.pth``
(flat layer-name keys ``conv1_1`` .. ``Mconv7_stage6_L2``): a VGG-style
feature trunk, then six refinement stages each predicting 38 part-affinity
-field channels (branch L1) and 19 keypoint heatmap channels (branch L2) from
the concatenated [L1, L2, trunk] features.

This is the TPU-native port: the network as a param pytree + strict
converter and an NHWC JAX forward (stride-8 maps), plus the standard
host-side decode — multi-scale inference, Gaussian-smoothed peak NMS,
PAF line-integral limb scoring, greedy bipartite assembly into per-person
keypoint subsets — and the canonical 18-point skeleton rendering. The hand
(``hand_pose_model.pth``) and face (``facenet.pth``) CPM branches are ported
too, with the body-keypoint-derived hand/face boxes and their renderings.
"""

from __future__ import annotations

import math
from typing import Dict, List, Mapping, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# trunk: (name, cin, cout, kernel) with "pool" markers; every conv is
# ReLU-activated except each branch's final Mconv7/conv5_5
_TRUNK = (
    ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3), "pool",
    ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3), "pool",
    ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
    ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3), "pool",
    ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3_CPM", 512, 256, 3), ("conv4_4_CPM", 256, 128, 3),
)
_BRANCH_OUT = {"L1": 38, "L2": 19}


def _stage_plan(stage: int, branch: str) -> Tuple[Tuple[str, int, int, int], ...]:
    out = _BRANCH_OUT[branch]
    if stage == 1:
        pre = f"conv5_%d_CPM_{branch}"
        return (((pre % 1), 128, 128, 3), ((pre % 2), 128, 128, 3),
                ((pre % 3), 128, 128, 3), ((pre % 4), 128, 512, 1),
                ((pre % 5), 512, out, 1))
    pre = f"Mconv%d_stage{stage}_{branch}"
    return tuple([((pre % i), 185 if i == 1 else 128, 128, 7)
                  for i in range(1, 6)] +
                 [((pre % 6), 128, 128, 1), ((pre % 7), 128, out, 1)])


def _all_convs():
    convs = [c for c in _TRUNK if c != "pool"]
    for stage in range(1, 7):
        for branch in ("L1", "L2"):
            convs.extend(_stage_plan(stage, branch))
    return convs


def init_openpose_body(key, dtype=jnp.float32) -> Dict:
    convs = _all_convs()
    ks = iter(jax.random.split(key, len(convs)))
    params = {}
    for name, ci, co, k in convs:
        params[name] = {
            "w": jax.random.normal(next(ks), (k, k, ci, co), dtype)
            * np.sqrt(2.0 / (k * k * ci)),
            "b": jnp.zeros((co,), dtype),
        }
    return params


def body_params_from_torch(sd: Mapping[str, np.ndarray],
                           dtype=jnp.float32) -> Dict:
    """Convert ``body_pose_model.pth`` (flat ``<layer>.weight/bias`` keys,
    torch OIHW convs). Strict: full key coverage both ways."""
    sd = dict(sd)
    params = {}
    for name, ci, co, k in _all_convs():
        w = np.asarray(sd.pop(name + ".weight"))
        if w.shape != (co, ci, k, k):
            raise ValueError(f"{name}: got {w.shape}, want {(co, ci, k, k)}")
        params[name] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype),
            "b": jnp.asarray(np.asarray(sd.pop(name + ".bias")), dtype),
        }
    if sd:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(sd)[:8]}")
    return params


def _conv(p, x, pad):
    return jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def body_forward(params: Dict, image: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                            jnp.ndarray]:
    """(B, H, W, 3) image, already ``x/256 - 0.5`` normalized, H and W
    multiples of 8 -> (paf (B, H/8, W/8, 38), heatmap (B, H/8, W/8, 19))."""
    h = image
    for c in _TRUNK:
        if c == "pool":
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        else:
            name, _, _, k = c
            h = jax.nn.relu(_conv(params[name], h, k // 2))
    trunk = h

    def run_branch(stage, branch, x):
        plan = _stage_plan(stage, branch)
        for name, _, _, k in plan[:-1]:
            x = jax.nn.relu(_conv(params[name], x, k // 2))
        name, _, _, k = plan[-1]
        return _conv(params[name], x, k // 2)

    paf = run_branch(1, "L1", trunk)
    heat = run_branch(1, "L2", trunk)
    for stage in range(2, 7):
        x = jnp.concatenate([paf, heat, trunk], axis=-1)
        paf, heat = run_branch(stage, "L1", x), run_branch(stage, "L2", x)
    return paf, heat


_body_forward_jit = jax.jit(body_forward)


# ---------------------------------------------------------------------------
# decode (host side, numpy) — the canonical multi-person assembly

# limb k connects body part limb_seq[k][0] -> [1] (1-based part ids) and is
# scored by PAF channels map_idx[k] (already offset to 0..37)
LIMB_SEQ = ((2, 3), (2, 6), (3, 4), (4, 5), (6, 7), (7, 8), (2, 9), (9, 10),
            (10, 11), (2, 12), (12, 13), (13, 14), (2, 1), (1, 15), (15, 17),
            (1, 16), (16, 18), (3, 17), (6, 18))
MAP_IDX = ((12, 13), (20, 21), (14, 15), (16, 17), (22, 23), (24, 25),
           (0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (10, 11), (28, 29),
           (30, 31), (34, 35), (32, 33), (36, 37), (18, 19), (26, 27))


def _pad_rd(img: np.ndarray, stride: int, pad_value: int):
    h, w = img.shape[:2]
    ph, pw = (-h) % stride, (-w) % stride
    out = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="constant",
                 constant_values=pad_value)
    return out, (ph, pw)


def body_estimate(params: Dict, image: np.ndarray,
                  scale_search=(0.5,), boxsize=368, stride=8, pad_value=128,
                  thre1=0.1, thre2=0.05) -> Tuple[np.ndarray, np.ndarray]:
    """uint8 (H, W, 3) -> (candidate (K, 4) [x, y, score, id],
    subset (P, 20) [18 candidate ids or -1, total score, #parts]).

    The standard body decode: per scale, network maps are cubic-resized back
    to image geometry and averaged; heatmaps are Gaussian-smoothed (sigma 3)
    and peak-NMSed above thre1; each limb's A-B pairs are scored by sampling
    the PAF along 10 points of the segment (criterion: 80% of samples above
    thre2 and positive distance-prior score); greedy assembly merges pairs
    into per-person subsets, dropping those with <4 parts or mean score
    < 0.4."""
    import cv2

    ori_h, ori_w = image.shape[:2]
    heat_avg = np.zeros((ori_h, ori_w, 19), np.float32)
    paf_avg = np.zeros((ori_h, ori_w, 38), np.float32)
    for scale in [s * boxsize / ori_h for s in scale_search]:
        scaled = cv2.resize(image, (0, 0), fx=scale, fy=scale,
                            interpolation=cv2.INTER_CUBIC)
        padded, (ph, pw) = _pad_rd(scaled, stride, pad_value)
        x = jnp.asarray(padded, jnp.float32)[None] / 256.0 - 0.5
        paf, heat = _body_forward_jit(params, x)
        for src, dst in ((np.asarray(heat)[0], heat_avg),
                         (np.asarray(paf)[0], paf_avg)):
            m = cv2.resize(src, (0, 0), fx=stride, fy=stride,
                           interpolation=cv2.INTER_CUBIC)
            m = m[:m.shape[0] - ph, :m.shape[1] - pw]
            m = cv2.resize(m, (ori_w, ori_h), interpolation=cv2.INTER_CUBIC)
            dst += m / len(scale_search)
    return decode_body_maps(heat_avg, paf_avg, thre1=thre1, thre2=thre2)


def decode_body_maps(heat_avg: np.ndarray, paf_avg: np.ndarray,
                     thre1=0.1, thre2=0.05) -> Tuple[np.ndarray, np.ndarray]:
    """Peak-NMS + PAF assembly on image-resolution (H, W, 19)/(H, W, 38)
    averaged maps — split out of body_estimate so the decode is testable with
    synthetic maps."""
    from scipy.ndimage import gaussian_filter

    ori_h = heat_avg.shape[0]
    all_peaks: List[List[tuple]] = []
    peak_id = 0
    for part in range(18):
        raw = heat_avg[:, :, part]
        smoothed = gaussian_filter(raw, sigma=3)
        up = np.zeros_like(smoothed); up[1:, :] = smoothed[:-1, :]
        dn = np.zeros_like(smoothed); dn[:-1, :] = smoothed[1:, :]
        lf = np.zeros_like(smoothed); lf[:, 1:] = smoothed[:, :-1]
        rt = np.zeros_like(smoothed); rt[:, :-1] = smoothed[:, 1:]
        is_peak = ((smoothed >= up) & (smoothed >= dn) & (smoothed >= lf)
                   & (smoothed >= rt) & (smoothed > thre1))
        ys, xs = np.nonzero(is_peak)
        peaks = []
        for xx, yy in zip(xs, ys):
            peaks.append((int(xx), int(yy), float(raw[yy, xx]), peak_id))
            peak_id += 1
        all_peaks.append(peaks)

    connection_all, special_k = [], []
    for k, ((a, b), (m1, m2)) in enumerate(zip(LIMB_SEQ, MAP_IDX)):
        score_mid = paf_avg[:, :, [m1, m2]]
        cand_a, cand_b = all_peaks[a - 1], all_peaks[b - 1]
        if not cand_a or not cand_b:
            special_k.append(k)
            connection_all.append([])
            continue
        candidates = []
        for i, pa in enumerate(cand_a):
            for j, pb in enumerate(cand_b):
                vec = np.array([pb[0] - pa[0], pb[1] - pa[1]], np.float32)
                norm = max(math.hypot(*vec), 1e-8)
                vecn = vec / norm
                pts = zip(np.linspace(pa[0], pb[0], 10),
                          np.linspace(pa[1], pb[1], 10))
                sc = np.array([score_mid[int(round(y)), int(round(x))]
                               for x, y in pts])
                score = sc @ vecn
                prior = (score.mean()
                         + min(0.5 * ori_h / norm - 1, 0))
                if (score > thre2).sum() > 0.8 * len(score) and prior > 0:
                    candidates.append((i, j, prior,
                                       prior + pa[2] + pb[2]))
        candidates.sort(key=lambda c: c[2], reverse=True)
        conn = []
        used_a, used_b = set(), set()
        for i, j, prior, _ in candidates:
            if i not in used_a and j not in used_b:
                conn.append([cand_a[i][3], cand_b[j][3], prior, i, j])
                used_a.add(i); used_b.add(j)
                if len(conn) >= min(len(cand_a), len(cand_b)):
                    break
        connection_all.append(conn)

    candidate = np.array([p for peaks in all_peaks for p in peaks],
                         np.float32).reshape(-1, 4)
    subset = -1 * np.ones((0, 20), np.float32)
    for k, (a, b) in enumerate(LIMB_SEQ):
        if k in special_k:
            continue
        ia, ib = a - 1, b - 1
        for pa, pb, score, _, _ in connection_all[k]:
            found = [s for s in range(len(subset))
                     if subset[s][ia] == pa or subset[s][ib] == pb]
            if len(found) == 1:
                s = found[0]
                if subset[s][ib] != pb:
                    subset[s][ib] = pb
                    subset[s][-1] += 1
                    subset[s][-2] += candidate[int(pb), 2] + score
            elif len(found) == 2:
                s1, s2 = found
                both = ((subset[s1] >= 0).astype(int)
                        + (subset[s2] >= 0).astype(int))[:-2]
                if (both > 1).sum() == 0:  # disjoint -> merge
                    subset[s1][:-2] += subset[s2][:-2] + 1
                    subset[s1][-2:] += subset[s2][-2:]
                    subset[s1][-2] += score
                    subset = np.delete(subset, s2, 0)
                else:
                    subset[s1][ib] = pb
                    subset[s1][-1] += 1
                    subset[s1][-2] += candidate[int(pb), 2] + score
            elif k < 17:
                row = -1 * np.ones(20, np.float32)
                row[ia], row[ib] = pa, pb
                row[-1] = 2
                row[-2] = (candidate[int(pa), 2] + candidate[int(pb), 2]
                           + score)
                subset = np.vstack([subset, row])
    keep = [s for s in range(len(subset))
            if subset[s][-1] >= 4 and subset[s][-2] / subset[s][-1] >= 0.4]
    return candidate, subset[keep]


# the canonical 18-part color table (R, G, B)
_POSE_COLORS = (
    (255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0), (170, 255, 0),
    (85, 255, 0), (0, 255, 0), (0, 255, 85), (0, 255, 170), (0, 255, 255),
    (0, 170, 255), (0, 85, 255), (0, 0, 255), (85, 0, 255), (170, 0, 255),
    (255, 0, 255), (255, 0, 170), (255, 0, 85))


def draw_bodypose(canvas: np.ndarray, candidate: np.ndarray,
                  subset: np.ndarray) -> np.ndarray:
    """Render limbs as width-4 ellipses and joints as radius-4 circles in the
    canonical colors onto ``canvas`` (uint8 RGB, modified copy returned)."""
    import cv2

    canvas = canvas.copy()
    for k in range(17):
        a, b = LIMB_SEQ[k]
        color = _POSE_COLORS[k]
        for person in subset:
            ids = person[[a - 1, b - 1]]
            if -1 in ids:
                continue
            (x1, y1), (x2, y2) = candidate[ids.astype(int), 0:2]
            mx, my = (x1 + x2) / 2, (y1 + y2) / 2
            length = math.hypot(x1 - x2, y1 - y2)
            angle = math.degrees(math.atan2(y1 - y2, x1 - x2))
            poly = cv2.ellipse2Poly((int(mx), int(my)),
                                    (int(length / 2), 4), int(angle), 0, 360,
                                    1)
            overlay = canvas.copy()
            cv2.fillConvexPoly(overlay, poly, color)
            canvas = cv2.addWeighted(canvas, 0.4, overlay, 0.6, 0)
    for part in range(18):
        for person in subset:
            idx = int(person[part])
            if idx == -1:
                continue
            x, y = candidate[idx, 0:2]
            cv2.circle(canvas, (int(x), int(y)), 4, _POSE_COLORS[part],
                       thickness=-1)
    return canvas


def openpose_annotate(params: Dict, image: np.ndarray,
                      hand_params: Dict = None,
                      face_params: Dict = None) -> np.ndarray:
    """uint8 (H, W, 3) -> uint8 (H, W, 3) pose control image: the detected
    skeletons drawn on black (OpenposeDetector's include_body/hand/face
    output; the hand and face branches run when their networks' params are
    supplied)."""
    candidate, subset = body_estimate(params, image)
    canvas = np.zeros_like(image)
    canvas = draw_bodypose(canvas, candidate, subset)
    if hand_params is not None:
        for x, y, w, _ in hand_detect(candidate, subset, image.shape[:2]):
            crop = image[y:y + w, x:x + w]
            if min(crop.shape[:2]) < 16:
                continue
            peaks = hand_estimate(hand_params, crop)
            found = peaks[:, 0] >= 0
            peaks[found] += np.array([x, y])
            canvas = draw_handpose(canvas, peaks)
    if face_params is not None:
        for x, y, w in face_detect(candidate, subset, image.shape[:2]):
            crop = image[y:y + w, x:x + w]
            if min(crop.shape[:2]) < 16:
                continue
            peaks = face_estimate(face_params, crop)
            found = peaks[:, 0] >= 0
            peaks[found] += np.array([x, y])
            canvas = draw_facepose(canvas, peaks)
    return canvas


# ---------------------------------------------------------------------------
# hand branch: the CPM hand network (``hand_pose_model.pth``, flat keys
# ``conv1_1`` .. ``Mconv7_stage6``) — a VGG19 trunk into 128-ch CPM features,
# a 22-map stage-1 head, and five 150->22 refinement stages — plus the
# body-keypoint-derived hand boxes and the 21-point hand skeleton rendering.

_HAND_TRUNK = (
    ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3), "pool",
    ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3), "pool",
    ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
    ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3), "pool",
    ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3", 512, 512, 3), ("conv4_4", 512, 512, 3),
    ("conv5_1", 512, 512, 3), ("conv5_2", 512, 512, 3),
    ("conv5_3_CPM", 512, 128, 3),
)


def _hand_stage_plan(stage: int, out: int = 22):
    """CPM refinement stage (shared by the hand net, out=22, and the face
    net — identical layer names with out=71, ``facenet.pth``)."""
    if stage == 1:
        return (("conv6_1_CPM", 128, 512, 1), ("conv6_2_CPM", 512, out, 1))
    pre = f"Mconv%d_stage{stage}"
    return tuple([((pre % i), 128 + out if i == 1 else 128, 128, 7)
                  for i in range(1, 6)] +
                 [((pre % 6), 128, 128, 1), ((pre % 7), 128, out, 1)])


def _hand_convs(out: int = 22):
    convs = [c for c in _HAND_TRUNK if c != "pool"]
    for stage in range(1, 7):
        convs.extend(_hand_stage_plan(stage, out))
    return convs


def init_openpose_hand(key, dtype=jnp.float32, out: int = 22) -> Dict:
    convs = _hand_convs(out)
    ks = iter(jax.random.split(key, len(convs)))
    return {name: {
        "w": jax.random.normal(next(ks), (k, k, ci, co), dtype)
        * np.sqrt(2.0 / (k * k * ci)),
        "b": jnp.zeros((co,), dtype)} for name, ci, co, k in convs}


def init_openpose_face(key, dtype=jnp.float32) -> Dict:
    return init_openpose_hand(key, dtype, out=71)


def _cpm_params_from_torch(sd, out: int, dtype):
    sd = dict(sd)
    params = {}
    for name, ci, co, k in _hand_convs(out):
        w = np.asarray(sd.pop(name + ".weight"))
        if w.shape != (co, ci, k, k):
            raise ValueError(f"{name}: got {w.shape}, want {(co, ci, k, k)}")
        params[name] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype),
            "b": jnp.asarray(np.asarray(sd.pop(name + ".bias")), dtype),
        }
    if sd:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(sd)[:8]}")
    return params


def hand_params_from_torch(sd: Mapping[str, np.ndarray],
                           dtype=jnp.float32) -> Dict:
    """Convert ``hand_pose_model.pth`` (flat layer-name keys, OIHW). Strict."""
    return _cpm_params_from_torch(sd, 22, dtype)


def face_params_from_torch(sd: Mapping[str, np.ndarray],
                           dtype=jnp.float32) -> Dict:
    """Convert ``facenet.pth`` — the same CPM topology with 71 maps. Strict."""
    return _cpm_params_from_torch(sd, 71, dtype)


def _cpm_forward(params: Dict, image: jnp.ndarray, out_ch: int) -> jnp.ndarray:
    h = image
    for c in _HAND_TRUNK:
        if c == "pool":
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        else:
            name, _, _, k = c
            h = jax.nn.relu(_conv(params[name], h, k // 2))
    feat = h

    def run_stage(stage, x):
        plan = _hand_stage_plan(stage, out_ch)
        for name, _, _, k in plan[:-1]:
            x = jax.nn.relu(_conv(params[name], x, k // 2))
        name, _, _, k = plan[-1]
        return _conv(params[name], x, k // 2)

    out = run_stage(1, feat)
    for stage in range(2, 7):
        out = run_stage(stage, jnp.concatenate([out, feat], axis=-1))
    return out


def hand_forward(params: Dict, image: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) image, ``x/256 - 0.5`` normalized, H/W multiples of 8 ->
    (B, H/8, W/8, 22) heatmaps (stage-6 output; every conv ReLU-activated
    except conv6_2_CPM and each Mconv7)."""
    return _cpm_forward(params, image, 22)


def face_forward(params: Dict, image: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/8, W/8, 71) face heatmaps (facenet stage 6)."""
    return _cpm_forward(params, image, 71)


_hand_forward_jit = jax.jit(hand_forward)
_face_forward_jit = jax.jit(face_forward)


def hand_estimate(params: Dict, image: np.ndarray,
                  scale_search=(0.5, 1.0, 1.5, 2.0), boxsize=368, stride=8,
                  pad_value=128, thre=0.05) -> np.ndarray:
    """uint8 (H, W, 3) hand crop -> (21, 2) int peak coordinates, (-1, -1)
    for undetected parts (the standard hand decode: multi-scale averaged
    heatmaps, Gaussian smoothing, largest connected component above ``thre``
    per part, argmax within it)."""
    import cv2
    from scipy.ndimage import gaussian_filter, label

    ori_h, ori_w = image.shape[:2]
    heat_avg = np.zeros((ori_h, ori_w, 22), np.float32)
    for scale in [s * boxsize / ori_h for s in scale_search]:
        scaled = cv2.resize(image, (0, 0), fx=scale, fy=scale,
                            interpolation=cv2.INTER_CUBIC)
        padded, (ph, pw) = _pad_rd(scaled, stride, pad_value)
        x = jnp.asarray(padded, jnp.float32)[None] / 256.0 - 0.5
        heat = np.asarray(_hand_forward_jit(params, x))[0]
        m = cv2.resize(heat, (0, 0), fx=stride, fy=stride,
                       interpolation=cv2.INTER_CUBIC)
        m = m[:m.shape[0] - ph, :m.shape[1] - pw]
        m = cv2.resize(m, (ori_w, ori_h), interpolation=cv2.INTER_CUBIC)
        heat_avg += m / len(scale_search)

    peaks = np.full((21, 2), -1, np.int64)
    for part in range(21):
        raw = heat_avg[:, :, part]
        smoothed = gaussian_filter(raw, sigma=3)
        binary = smoothed > thre
        if not binary.any():
            continue
        labels, n = label(binary, structure=np.ones((3, 3), bool))
        sums = [raw[labels == i].sum() for i in range(1, n + 1)]
        keep = int(np.argmax(sums)) + 1
        masked = np.where(labels == keep, raw, 0.0)
        peaks[part] = np.unravel_index(masked.argmax(), masked.shape)[::-1]
    return peaks


def hand_detect(candidate: np.ndarray, subset: np.ndarray,
                shape: Tuple[int, int]) -> List[Tuple[int, int, int, bool]]:
    """Derive square hand boxes (x, y, width, is_left) from body keypoints:
    the box is centered past the wrist along the elbow->wrist direction
    (ratio 0.33), sized 1.5*max(|wrist-elbow|, 0.9*|elbow-shoulder|).
    Indices are 0-based subset columns: left arm 5/6/7 (LShoulder/LElbow/
    LWrist), right arm 2/3/4 — the reference handDetect's person[[5,6,7]]
    and person[[2,3,4]]."""
    h, w = shape
    out = []
    for person in subset:
        for shoulder, elbow, wrist, is_left in ((5, 6, 7, True),
                                                (2, 3, 4, False)):
            ids = person[[shoulder, elbow, wrist]]
            if -1 in ids:
                continue
            (x1, y1), (x2, y2), (x3, y3) = candidate[ids.astype(int), 0:2]
            x = x3 + 0.33 * (x3 - x2)
            y = y3 + 0.33 * (y3 - y2)
            width = 1.5 * max(math.hypot(x3 - x2, y3 - y2),
                              0.9 * math.hypot(x2 - x1, y2 - y1))
            x, y = x - width / 2, y - width / 2
            x, y = max(0, int(x)), max(0, int(y))
            width = int(min(width, w - x, h - y))
            if width >= 20:
                out.append((x, y, width, is_left))
    return out


def face_estimate(params: Dict, image: np.ndarray, input_size=384,
                  thre=0.05) -> np.ndarray:
    """uint8 (H, W, 3) face crop -> (70, 2) int peak coordinates, (-1, -1)
    for undetected parts (the face decode: one pass at the 384-square input,
    heatmaps upsampled back to the crop with align-corners bilinear, per-part
    argmax above ``thre``)."""
    import cv2

    ori_h, ori_w = image.shape[:2]
    interp = cv2.INTER_AREA if input_size < min(ori_h, ori_w) \
        else cv2.INTER_LANCZOS4
    scaled = cv2.resize(image, (input_size, input_size), interpolation=interp)
    x = jnp.asarray(scaled, jnp.float32)[None] / 256.0 - 0.5
    heat = _face_forward_jit(params, x)
    from goal_force_tpu.extensions.depth import _resize_bilinear_ac

    heat = np.asarray(_resize_bilinear_ac(heat, ori_h, ori_w))[0]

    peaks = np.full((70, 2), -1, np.int64)
    for part in range(70):
        raw = heat[:, :, part]
        if (raw > thre).any():
            peaks[part] = np.unravel_index(
                np.where(raw > thre, raw, -np.inf).argmax(), raw.shape)[::-1]
    return peaks


def face_detect(candidate: np.ndarray, subset: np.ndarray,
                shape: Tuple[int, int]) -> List[Tuple[int, int, int]]:
    """Square face boxes (x, y, width) from the nose/eye/ear body keypoints
    (width = max over 3x the nose-eye distances and 1.5x the nose-ear
    distances; box spans [center - w, center + w])."""
    h, w = shape
    out = []
    for person in subset:
        if person[0] < 0:
            continue
        x0, y0 = candidate[int(person[0]), 0:2]
        width = 0.0
        for part, factor in ((14, 3.0), (15, 3.0), (16, 1.5), (17, 1.5)):
            if person[part] < 0:
                continue
            x1, y1 = candidate[int(person[part]), 0:2]
            width = max(width, max(abs(x0 - x1), abs(y0 - y1)) * factor)
        if width == 0.0:
            continue
        x, y = max(0, int(x0 - width)), max(0, int(y0 - width))
        size = int(min(width * 2, w - x, h - y))
        if size >= 20:
            out.append((x, y, size))
    return out


def draw_facepose(canvas: np.ndarray, peaks: np.ndarray) -> np.ndarray:
    """Render the 70 face landmarks as small white dots."""
    import cv2

    canvas = canvas.copy()
    for x, y in peaks:
        if x >= 0:
            cv2.circle(canvas, (int(x), int(y)), 3, (255, 255, 255),
                       thickness=-1)
    return canvas


_HAND_EDGES = ((0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (6, 7), (7, 8),
               (0, 9), (9, 10), (10, 11), (11, 12), (0, 13), (13, 14),
               (14, 15), (15, 16), (0, 17), (17, 18), (18, 19), (19, 20))


def draw_handpose(canvas: np.ndarray, peaks: np.ndarray) -> np.ndarray:
    """Render the 21-point hand skeleton: HSV-spread edge colors, width-2
    lines, blue joint dots (the canonical hand rendering)."""
    import colorsys

    import cv2

    canvas = canvas.copy()
    for ie, (a, b) in enumerate(_HAND_EDGES):
        if (peaks[a] < 0).any() or (peaks[b] < 0).any():
            continue
        rgb = colorsys.hsv_to_rgb(ie / len(_HAND_EDGES), 1.0, 1.0)
        color = tuple(int(c * 255) for c in rgb)
        cv2.line(canvas, tuple(peaks[a]), tuple(peaks[b]), color, 2)
    for x, y in peaks:
        if x >= 0:
            cv2.circle(canvas, (int(x), int(y)), 4, (0, 0, 255), thickness=-1)
    return canvas
