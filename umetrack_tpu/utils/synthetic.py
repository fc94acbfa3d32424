"""Synthetic multi-view sequence generator (tests, benchmarks, training).

Builds a 4-camera fisheye rig around a hand-sized workspace, animates GT
poses from the generic hand model, and *renders the hands geometrically*
(bones + joints projected through the real camera models, drawn over smooth
noise) so the GT pose is inferable from pixels — which makes the synthetic
corpus trainable, closing the accuracy loop without the absent
UmeTrack_data (reference .MISSING_LARGE_BLOBS:1).

Two protocols mirror the reference eval table (load_eval.py:92-105):
``mode="separate"`` keeps the hands apart; ``mode="hand_hand"`` drives them
through each other's view cones with crossing motion and mutual occlusion.
Per-sequence ``hand_scale`` exercises the unknown-skeleton calibration.
"""
from __future__ import annotations

import json
import os

import numpy as np

GENERIC_HAND_JSON = os.environ.get(
    "UMETRACK_GENERIC_HAND_JSON",
    os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                 "generic_hand_model.json"),
)

CAM_JS = {
    "ImageSizeX": 640,
    "ImageSizeY": 480,
    "DistortionModel": "FishEye62",
    "fx": 275.0,
    "fy": 275.0,
    "cx": 319.5,
    "cy": 239.5,
    "k1": 0.35,
    "k2": 0.27,
    "k3": -0.5,
    "k4": 0.4,
    "p1": 1e-4,
    "p2": -2e-4,
    "k5": 0.0,
    "k6": 0.0,
}

N_CAMS = 4

# Rendering style for all synthetic sequences: "capsule" = the 3-D shaded
# capsule ray tracer (utils/render.py — round 5, attacks the angle-
# generalization gap of flat strokes), "strokes" = the round-4 cv2 stroke
# renderer (kept for A/Bs and archaeology).
DEFAULT_RENDER_STYLE = "capsule"


def load_generic_hand_dict():
    """Load the vendored generic hand model (assets/generic_hand_model.json,
    the reference's dataset/generic_hand_model.json data asset)."""
    with open(GENERIC_HAND_JSON) as fp:
        return json.load(fp)


def look_at_pose(position, target):
    """Camera-to-world with +z looking from position toward target."""
    z = target - position
    z = z / np.linalg.norm(z)
    up = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(z, up)) > 0.95:
        up = np.array([1.0, 0.0, 0.0])
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    m = np.eye(4)
    m[:3, 0] = x
    m[:3, 1] = y
    m[:3, 2] = z
    m[:3, 3] = position
    return m


CAM_POSITIONS = np.array(
    [
        [-120.0, -60.0, -430.0],
        [120.0, -60.0, -430.0],
        [-150.0, 80.0, -410.0],
        [150.0, 80.0, -410.0],
    ]
)


def make_camera_poses(target=None):
    """Four cameras ~450 mm out, looking at ``target`` (default origin; mm
    world units)."""
    target = np.zeros(3) if target is None else np.asarray(target, np.float64)
    return np.stack(
        [look_at_pose(p, target) for p in CAM_POSITIONS]
    ).astype(np.float32)


def smooth_images(rng, t, n=N_CAMS, h=480, w=640, lo=40, hi=220):
    """Temporally-varying smooth noise images, uint8 [T, N, H, W]."""
    import cv2

    base = rng.uniform(lo, hi, size=(t, n, 15, 20)).astype(np.float32)
    out = np.empty((t, n, h, w), np.uint8)
    for i in range(t):
        for c in range(n):
            img = cv2.resize(base[i, c], (w, h), interpolation=cv2.INTER_CUBIC)
            out[i, c] = np.clip(img, 0, 255).astype(np.uint8)
    return out


# -- geometric hand rendering -------------------------------------------------

# Landmark topology for drawing, in the reference LANDMARK enum order
# (/root/reference/lib/common/hand.py:24-45): 0-4 fingertips
# (thumb..pinky), 5 wrist, 6-7 thumb frames, 8-19 proximal/intermediate/
# distal frames per finger, 20 palm center.
_BONES = (
    (5, 6), (6, 7), (7, 0),
    (5, 8), (8, 9), (9, 10), (10, 1),
    (5, 11), (11, 12), (12, 13), (13, 2),
    (5, 14), (14, 15), (15, 16), (16, 3),
    (5, 17), (17, 18), (18, 19), (19, 4),
    (5, 20),
)
# Per-bone gray level: one band per finger so the digits are visually
# distinguishable in a mono image.
_BONE_GRAY = (
    150, 150, 150,
    170, 170, 170, 170,
    190, 190, 190, 190,
    210, 210, 210, 210,
    230, 230, 230, 230,
    140,
)


def _project_fisheye_np(v_eye: np.ndarray, cam_js: dict) -> np.ndarray:
    """[..., 3] eye points -> [..., 2] pixels; numpy mirror of
    geometry/cameras.py arctan_project + fisheye62_distort (reference
    camera.py:78-141)."""
    x, y, z = v_eye[..., 0], v_eye[..., 1], v_eye[..., 2]
    r = np.sqrt(x * x + y * y)
    s = np.arctan2(r, z) / np.maximum(r, 1e-18)
    p = np.stack([x * s, y * s], axis=-1)

    k = [cam_js[n] for n in ("k1", "k2", "k3", "k4")]
    p1, p2 = cam_js["p1"], cam_js["p2"]
    k5, k6 = cam_js["k5"], cam_js["k6"]
    r2 = np.clip(np.sum(p * p, axis=-1), 0.0, np.pi ** 2)
    radial = (
        1 + k[0] * r2 + k[1] * r2 ** 2 + k[2] * r2 ** 3 + k[3] * r2 ** 4
        + k5 * r2 ** 5 + k6 * r2 ** 6
    )
    uv = p * radial[..., None]
    ux, uy = uv[..., 0], uv[..., 1]
    r2t = ux * ux + uy * uy
    xd = ux + 2 * p2 * ux * uy + p1 * (r2t + 2 * ux * ux)
    yd = uy + 2 * p1 * ux * uy + p2 * (r2t + 2 * uy * uy)
    fx, fy, cx, cy = (cam_js[n] for n in ("fx", "fy", "cx", "cy"))
    return np.stack([xd * fx + cx, yd * fy + cy], axis=-1)


def _project_pinhole_np(v_eye: np.ndarray, k33: np.ndarray) -> np.ndarray:
    uv = v_eye[..., :2] / np.maximum(v_eye[..., 2:3], 1e-6)
    return np.stack(
        [uv[..., 0] * k33[0, 0] + k33[0, 2], uv[..., 1] * k33[1, 1] + k33[1, 2]],
        axis=-1,
    )


def _skin_jit():
    """Cached CPU-jitted skinner (corpus generation calls it thousands of
    times; eager per-op dispatch would dominate generation time)."""
    global _SKIN_JIT
    if _SKIN_JIT is None:
        import jax

        from ..kinematics.skinning import skin_landmarks

        _SKIN_JIT = jax.jit(skin_landmarks)
    return _SKIN_JIT


_SKIN_JIT = None


def tracker_gt_landmarks(hand_dict, angles, wrists) -> np.ndarray:
    """World landmarks [T, 2, 21, 3] (mm) with the tracker's right-hand
    convention — mirror the wrist x column, skin the left model
    (perspective_crop.py:40-51).  Runs on host CPU regardless of the default
    JAX backend."""
    import jax

    from ..kinematics.hand import from_dict

    angles = np.asarray(angles, np.float32)  # [T, 2, 22]
    wrists = np.asarray(wrists, np.float32)  # [T, 2, 4, 4]
    wrists = wrists.copy()
    wrists[:, 1, :, 0] *= -1.0  # right hand: mirror wrist x basis column

    with jax.default_device(jax.devices("cpu")[0]):
        hand = from_dict(hand_dict)
        lm = _skin_jit()(hand, angles, wrists)
        return np.asarray(jax.device_get(lm))


def mirrored_gt_landmarks(hand_dict, angles, wrists, is_right) -> np.ndarray:
    """World landmarks [T, 21, 3] (mm) with the torch_data convention —
    skin the per-sample mirrored hand model (run_inference_torch_data.py:
    91-94, hand.py:101-134)."""
    import jax

    from ..kinematics.hand import from_dict, mirrored_hand_model

    with jax.default_device(jax.devices("cpu")[0]):
        hand = from_dict(hand_dict)
        hand = mirrored_hand_model(hand, bool(is_right))
        lm = _skin_jit()(
            hand,
            np.asarray(angles, np.float32),
            np.asarray(wrists, np.float32),
        )
        return np.asarray(jax.device_get(lm))


# Approximate anatomical stroke widths (mm) per bone, indexed like _BONES:
# thumb chain, then 4 fingers x 4 segments, then wrist->palm.
_BONE_WIDTH_MM = (
    22.0, 18.0, 15.0,
    17.0, 15.0, 13.0, 11.0,
    18.0, 16.0, 14.0, 12.0,
    17.0, 15.0, 13.0, 11.0,
    14.0, 12.0, 11.0, 10.0,
    30.0,
)


def draw_hands_on_image(
    img: np.ndarray,  # [H, W] uint8, modified in place
    pix: np.ndarray,  # [n_hands, 21, 2] pixel coords
    in_front: np.ndarray,  # [n_hands, 21] bool (z > 0 in eye space)
    thickness: int = 3,
    z_mm: np.ndarray | None = None,  # [n_hands, 21] eye-space depth (mm)
    px_per_mm: float | None = None,  # focal/z scale base (fx / 1 mm)
) -> None:
    """Draw hands as filled low-frequency shapes: a palm polygon plus
    thick, depth-scaled finger strokes with depth shading.

    With ``z_mm``/``px_per_mm`` given, stroke width is the anatomical width
    projected to pixels (w_mm * fx / z) and brightness falls off with depth
    — volumetric-looking hands that survive the backbone's /16 feature
    downsampling, unlike the original 3-px stick figure (round-4 finding:
    held-out MPJPA floored ~15 deg on stick renders while train reached
    ~2 deg).  Without depth info it falls back to constant ``thickness``.

    Hands are drawn in index order, so hand 1 occludes hand 0 where they
    overlap (a fixed, consistent z-order — genuine mutual occlusion for the
    hand_hand protocol)."""
    import cv2

    h, w = img.shape
    for hand in range(pix.shape[0]):
        p = pix[hand]
        ok = (
            in_front[hand]
            & np.isfinite(p).all(axis=-1)
            & (np.abs(p) < 4 * max(h, w)).all(axis=-1)
        )

        def width_of(b, i, j):
            if z_mm is None or px_per_mm is None:
                return thickness
            z = max(float(z_mm[hand, i] + z_mm[hand, j]) / 2, 50.0)
            return int(np.clip(round(_BONE_WIDTH_MM[b] * px_per_mm / z), 2, 25))

        def shade(base, i, j):
            if z_mm is None:
                return int(base)
            # nearer = brighter: +-18% over the +-60 mm workspace depth range
            z = float(z_mm[hand, i] + z_mm[hand, j]) / 2
            return int(np.clip(base * (1.0 + (450.0 - z) / 330.0), 30, 255))

        # palm: filled polygon over wrist + finger bases + palm center
        palm_ids = [5, 8, 11, 14, 17, 20]
        if all(ok[i] for i in palm_ids):
            pts = np.asarray(
                [[int(round(p[i, 0])), int(round(p[i, 1]))] for i in palm_ids],
                np.int32,
            )
            hull = cv2.convexHull(pts)
            cv2.fillConvexPoly(img, hull, shade(120, 5, 20), lineType=cv2.LINE_AA)

        for b, (i, j) in enumerate(_BONES):
            if ok[i] and ok[j]:
                cv2.line(
                    img,
                    (int(round(p[i, 0])), int(round(p[i, 1]))),
                    (int(round(p[j, 0])), int(round(p[j, 1]))),
                    shade(_BONE_GRAY[b], i, j),
                    thickness=width_of(b, i, j),
                    lineType=cv2.LINE_AA,
                )
        for l in range(21):
            if ok[l]:
                r = (
                    max(width_of(0, l, l) // 2 + 1, 2)
                    if z_mm is not None and px_per_mm is not None
                    else (thickness if l < 5 else max(thickness - 1, 1))
                )
                cv2.circle(
                    img,
                    (int(round(p[l, 0])), int(round(p[l, 1]))),
                    r,
                    255 if l < 5 else shade(90 + 7 * l, l, l),
                    thickness=-1,
                    lineType=cv2.LINE_AA,
                )


def render_fisheye_sequence(
    landmarks_world: np.ndarray,  # [T, 2, 21, 3] mm
    cam_poses: np.ndarray,  # [N, 4, 4] camera-to-world
    cam_jss,  # list of N camera JSON dicts
    rng,
    h: int = 480,
    w: int = 640,
    style: str = None,
    radius_scale: float = 1.0,
) -> np.ndarray:  # [T, N, H, W] uint8
    """Render both hands into every fisheye view over a smooth-noise
    background.  ``style`` selects the renderer (DEFAULT_RENDER_STYLE)."""
    t = landmarks_world.shape[0]
    n = cam_poses.shape[0]
    images = smooth_images(rng, t, n=n, h=h, w=w, lo=25, hi=95)
    if (style or DEFAULT_RENDER_STYLE) == "capsule":
        from .render import render_sequence

        return render_sequence(
            landmarks_world, cam_poses, cam_jss, images, rng,
            radius_scale=radius_scale,
        )
    world_to_cam = np.stack([np.linalg.inv(p) for p in cam_poses])
    for ti in range(t):
        for c in range(n):
            r = world_to_cam[c, :3, :3]
            tr = world_to_cam[c, :3, 3]
            v_eye = landmarks_world[ti] @ r.T + tr  # [2, 21, 3]
            pix = _project_fisheye_np(v_eye, cam_jss[c])
            draw_hands_on_image(
                images[ti, c], pix, v_eye[..., 2] > 1.0,
                z_mm=v_eye[..., 2], px_per_mm=float(cam_jss[c]["fx"]),
            )
    return images


def make_gt_motion(rng, t, hand_dict, mode: str = "separate"):
    """GT joint angles / wrist transforms / confidences for two hands.

    Wrists hover near the origin with slow translation + rotation; angles
    interpolate inside joint limits.  A confidence dropout knocks hand 1 out
    for a few frames mid-sequence.

    ``mode="hand_hand"`` reproduces the reference's interacting-hands
    protocol geometry (load_eval.py:92-105): the hands start close and cross
    each other's position each period, so they share view cones and occlude
    each other in every camera.
    """
    from scipy.spatial.transform import Rotation

    limits = np.asarray(hand_dict["joint_limits"], np.float32)  # [22, 2]
    angles = np.zeros((t, 2, 22), np.float32)
    wrists = np.zeros((t, 2, 4, 4), np.float32)
    conf = np.ones((t, 2), np.float32)

    for hand in range(2):
        phase = rng.uniform(0, 2 * np.pi, size=22)
        freq = rng.uniform(0.02, 0.08, size=22)
        mid = (limits[:, 0] + limits[:, 1]) / 2
        amp = (limits[:, 1] - limits[:, 0]) / 4
        for ti in range(t):
            angles[ti, hand] = mid + amp * np.sin(freq * ti + phase)

        sign = -1.0 if hand == 0 else 1.0
        if mode == "hand_hand":
            base_pos = np.array([sign * 25.0, sign * 10.0, 0.0])
        else:
            base_pos = np.array([sign * 60.0, 0.0, 0.0])
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        base_rot = Rotation.from_rotvec(
            rng.uniform(0, np.pi) * np.array([0, 0, 1.0])
        )
        for ti in range(t):
            r = Rotation.from_rotvec(axis * 0.02 * ti) * base_rot
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = r.as_matrix()
            wobble = np.array(
                [20 * np.sin(0.05 * ti), 15 * np.cos(0.04 * ti),
                 10 * np.sin(0.03 * ti)]
            )
            if mode == "hand_hand":
                # crossing term: the hands swap sides each period, passing
                # through each other's silhouette near the view center
                wobble = wobble + np.array(
                    [-sign * 55.0 * np.sin(0.08 * ti), 0.0, 0.0]
                )
            m[:3, 3] = base_pos + wobble
            wrists[ti, hand] = m

    lo = t // 3
    conf[lo: lo + 3, 1] = 0.0
    return angles, wrists, conf


def scaled_hand_dict(hand_dict: dict, scale: float) -> dict:
    """Uniformly scale a hand-model dict's rest geometry (the dict analog of
    kinematics.scaled_hand_model / reference hand.py:65-98)."""
    out = dict(hand_dict)
    for key in ("joint_rest_positions", "landmark_rest_positions"):
        out[key] = (np.asarray(hand_dict[key], np.float32) * scale).tolist()
    base = hand_dict.get("hand_scale")
    out["hand_scale"] = float(base if base is not None else 1.0) * scale
    return out


def make_labels_dict(
    t,
    rng_seed=0,
    with_dropout=True,
    mode: str = "separate",
    hand_scale: float | None = None,
    render: bool = True,
    render_style: str = None,
):
    """Full label dict in the raw_data JSON schema + image tensor.

    ``render=True`` draws the GT hands into the fisheye views (pose is then
    inferable from pixels — the trainable-corpus requirement);
    ``mode="hand_hand"`` generates interacting/occluding hands;
    ``hand_scale`` scales the GT user skeleton relative to the generic model
    (what the unknown-skeleton protocol must recover);
    ``render_style`` selects the renderer (default DEFAULT_RENDER_STYLE).
    """
    rng = np.random.default_rng(rng_seed)
    hand_dict = load_generic_hand_dict()
    if hand_scale is not None:
        hand_dict = scaled_hand_dict(hand_dict, hand_scale)

    cam_poses = make_camera_poses()
    angles, wrists, conf = make_gt_motion(rng, t, hand_dict, mode=mode)
    if not with_dropout:
        conf[:] = 1.0
    if render:
        landmarks = tracker_gt_landmarks(hand_dict, angles, wrists)
        cam_jss = [dict(CAM_JS) for _ in range(N_CAMS)]
        images = render_fisheye_sequence(
            landmarks, cam_poses, cam_jss, rng, style=render_style,
            radius_scale=hand_scale if hand_scale is not None else 1.0,
        )
    else:
        images = smooth_images(rng, t)

    labels = {
        "cameras": [dict(CAM_JS) for _ in range(N_CAMS)],
        "camera_angles": [0.0, 0.0, 180.0, 180.0],
        "camera_to_world_transforms": np.tile(cam_poses, (t, 1, 1, 1)).tolist(),
        "joint_angles": angles.tolist(),
        "wrist_transforms": wrists.tolist(),
        "hand_confidences": conf.tolist(),
        "hand_model": hand_dict,
    }
    return labels, images


def our_sequence(labels, images):
    """Build device-side FrameObservation (leading T axis) + rig + hand."""
    import jax.numpy as jnp

    from ..kinematics.hand import from_dict
    from ..tracker.types import FrameObservation
    from ..tracker.video import rig_from_labels

    rig = rig_from_labels(labels)
    seq = FrameObservation(
        images=jnp.asarray(images),
        T_world_from_camera=jnp.asarray(
            np.asarray(labels["camera_to_world_transforms"], np.float32)
        ),
        gt_joint_angles=jnp.asarray(
            np.asarray(labels["joint_angles"], np.float32)
        ),
        gt_wrist_xfs=jnp.asarray(
            np.asarray(labels["wrist_transforms"], np.float32)
        ),
        gt_confidences=jnp.asarray(
            np.asarray(labels["hand_confidences"], np.float32)
        ),
    )
    hand = from_dict(labels["hand_model"])
    return rig, seq, hand


def write_torchdata_corpus(
    root: str,
    n_train: int = 64,
    n_test: int = 8,
    t: int = 16,
    h: int = 120,
    w: int = 160,
    seed0: int = 0,
) -> dict:
    """Write a rendered synthetic torch_data corpus to disk with
    ``write_idxbin`` (training + testing splits under ``root/synthetic/``),
    alternating hands and varying the GT hand scale per sequence.  The
    corpus is the self-consistent benchmark's training set (the reference's
    UmeTrack_data and pretrained weights are not distributed)."""
    from ..data.idxbin import write_idxbin

    out = {}
    for split, n, base in (("training", n_train, 0), ("testing", n_test, 50_000)):
        monos, labels_list = [], []
        for i in range(n):
            rng = np.random.default_rng(seed0 + base + i)
            scale = float(rng.uniform(0.85, 1.15))
            mono, labels = make_torchdata_sample(
                rng_seed=seed0 + base + i, t=t, h=h, w=w,
                hand_idx=i % 2, hand_scale=scale,
            )
            monos.append(mono)
            labels_list.append(labels)
        folder = os.path.join(root, "synthetic", split)
        write_idxbin(os.path.join(folder, "mono"), monos)
        write_idxbin(
            os.path.join(folder, "labels"), labels_list, msgpack_objects=True
        )
        out[split] = folder
    return out


def make_torchdata_sample(
    rng_seed=0,
    t=3,
    v=2,
    h=120,
    w=160,
    hand_idx=1,
    render: bool = True,
    hand_scale: float | None = None,
):
    """Synthetic raw torch_data sample in the reference msgpack schema
    (pinhole views looking at the hand near the origin, mm units).

    With ``render=True`` the sample is *trainable*: GT motion comes from
    the same generator as the raw_data sequences, the hand is drawn
    geometrically into both pinhole views (torch_data convention: mirrored
    hand model skinning, run_inference_torch_data.py:91-94), and
    ``enclosing_points`` are the 63 crop points of the reference protocol
    (GT + neutral + open pose landmarks, perspective_crop.py:89-115).
    """
    rng = np.random.default_rng(rng_seed)
    generic_dict = load_generic_hand_dict()
    hand_dict = (
        scaled_hand_dict(generic_dict, hand_scale)
        if hand_scale is not None
        else generic_dict
    )

    motion_angles, motion_wrists, _ = make_gt_motion(rng, t, hand_dict)
    angles = motion_angles[:, hand_idx]  # [t, 22]
    wrist = motion_wrists[:, hand_idx]  # [t, 4, 4]

    # Aim the views at the hand's mean position so it stays fully inside the
    # modest torch_data frames.
    center = motion_wrists[:, hand_idx, :3, 3].mean(axis=0)
    cam_poses = make_camera_poses(target=center)[:v]  # [V, 4, 4] mm
    extr = np.stack(
        [np.linalg.inv(p).astype(np.float32) for p in cam_poses]
    )  # world->eye
    extr = np.tile(extr, (t, 1, 1, 1))

    # Per-sequence focal + stroke-thickness jitter when rendering: the
    # trained model must transfer to the fisheye eval crops, whose effective
    # per-crop resolution and stroke width differ from the pinhole
    # torch_data views.
    focal = float(rng.uniform(170.0, 235.0)) if render else 200.0
    thickness = int(rng.integers(2, 5)) if render else 3
    intr = np.tile(np.eye(3, dtype=np.float32), (t, v, 1, 1))
    intr[..., 0, 0] = intr[..., 1, 1] = focal
    intr[..., 0, 2] = (w - 1) / 2
    intr[..., 1, 2] = (h - 1) / 2
    solved_angles = angles + rng.normal(0, 0.05, size=(t, 22)).astype(np.float32)
    solved_wrist = wrist.copy()

    if render:
        lm_gt = mirrored_gt_landmarks(hand_dict, angles, wrist, hand_idx == 1)
        limits = np.asarray(hand_dict["joint_limits"], np.float32)
        neutral = np.broadcast_to(
            (limits[:, 0] + limits[:, 1]) / 2, angles.shape
        )
        lm_neutral = mirrored_gt_landmarks(
            hand_dict, neutral, wrist, hand_idx == 1
        )
        lm_open = mirrored_gt_landmarks(
            hand_dict, np.zeros_like(angles), wrist, hand_idx == 1
        )
        enclosing = np.concatenate(
            [lm_gt, lm_neutral, lm_open], axis=1
        ).astype(np.float32)  # [t, 63, 3]

        mono = smooth_images(rng, t, n=v, h=h, w=w, lo=25, hi=95)
        if DEFAULT_RENDER_STYLE == "capsule":
            from .render import render_pinhole_sequence

            mono = render_pinhole_sequence(
                lm_gt[:, None], cam_poses, intr[0], mono, rng,
                radius_scale=hand_scale if hand_scale is not None else 1.0,
            )
        else:
            world_to_cam = np.stack([np.linalg.inv(p) for p in cam_poses])
            for ti in range(t):
                for c in range(v):
                    r3 = world_to_cam[c, :3, :3]
                    tr = world_to_cam[c, :3, 3]
                    v_eye = lm_gt[ti] @ r3.T + tr  # [21, 3]
                    pix = _project_pinhole_np(v_eye, intr[ti, c])
                    draw_hands_on_image(
                        mono[ti, c], pix[None], (v_eye[..., 2] > 1.0)[None],
                        thickness=thickness,
                        z_mm=v_eye[None, ..., 2], px_per_mm=focal,
                    )
    else:
        import cv2

        enclosing = rng.uniform(-80, 80, size=(t, 63, 3)).astype(np.float32)
        base = rng.uniform(0, 255, size=(t * v, 12, 16)).astype(np.float32)
        mono = np.stack(
            [
                cv2.resize(b, (w, h), interpolation=cv2.INTER_CUBIC).clip(0, 255)
                for b in base
            ]
        ).astype(np.uint8).reshape(t, v, h, w)

    labels = {
        "extrinsics": extr.tolist(),
        "intrinsics": intr.tolist(),
        "enclosing_points": enclosing.tolist(),
        "hand": [float(hand_idx)] * t,
        "hand_model": hand_dict,
        "wrist": wrist.tolist(),
        "joint_angles": angles.tolist(),
        "solved_wrist_xfs": solved_wrist.tolist(),
        "solved_joint_angles": solved_angles.tolist(),
        "generic_hand_model": generic_dict,
        "pinch": [0.0] * t,
    }
    return mono, labels
