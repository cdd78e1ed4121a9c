from .gltf import load_gltf  # noqa: F401
from .scene import CpuScene, load_scene, upload_scene  # noqa: F401
from .camera import Camera  # noqa: F401
from .animation import AnimationRig, transform_deltas  # noqa: F401
from .refit import refit_scene  # noqa: F401
from .edit import add_instance, remove_instance  # noqa: F401
