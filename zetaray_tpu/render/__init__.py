from .frame import RenderConfig, render_frame, render_frame_jit  # noqa: F401
