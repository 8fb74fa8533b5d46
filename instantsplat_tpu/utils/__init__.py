from instantsplat_tpu.utils import sh, transforms, schedules  # noqa: F401
