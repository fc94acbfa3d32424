"""Test-side synthetic helpers: re-export the package generator and add the
reference-style frame iterator used by parity tests."""
import numpy as np

from umetrack_tpu.utils.synthetic import (  # noqa: F401
    CAM_JS,
    N_CAMS,
    make_camera_poses,
    make_gt_motion,
    make_labels_dict,
    our_sequence,
    smooth_images,
)


def reference_input_frames(labels, images):
    """Yield reference-style (InputFrame, gt_tracking) like
    SyncedImagePoseStream (video_pose_data.py:106-151)."""
    from lib.common.camera import read_camera_from_json
    from lib.tracker.tracker import InputFrame, ViewData
    from lib.tracker.tracking_result import SingleHandPose

    t = len(images)
    cam_protos = [read_camera_from_json(c) for c in labels["cameras"]]
    cam_poses = np.asarray(labels["camera_to_world_transforms"], np.float64)
    angles = np.asarray(labels["joint_angles"], np.float64)
    wrists = np.asarray(labels["wrist_transforms"], np.float64)
    conf = np.asarray(labels["hand_confidences"], np.float64)

    for ti in range(t):
        gt = {}
        for hand in range(2):
            if conf[ti, hand] > 0:
                gt[hand] = SingleHandPose(
                    joint_angles=angles[ti, hand],
                    wrist_xform=wrists[ti, hand],
                    hand_confidence=conf[ti, hand],
                )
        views = []
        for ci, proto in enumerate(cam_protos):
            cam = proto.copy(camera_to_world_xf=cam_poses[ti, ci])
            views.append(
                ViewData(
                    image=images[ti, ci],
                    camera=cam,
                    camera_angle=labels["camera_angles"][ci],
                )
            )
        yield InputFrame(views=views), gt
