from instantsplat_tpu.render.driver import RenderOut, render  # noqa: F401
