from .frame import (  # noqa: F401
    RenderConfig,
    FrameState,
    render_frame,
    render_frame_jit,
    render_frame_restir,
    render_frame_restir_jit,
)
