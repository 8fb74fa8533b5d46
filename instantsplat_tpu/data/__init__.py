from instantsplat_tpu.data import colmap, covis, images, ply, scene  # noqa: F401
