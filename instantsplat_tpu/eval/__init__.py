from instantsplat_tpu.eval import image_metrics, pose_metrics  # noqa: F401
