from .dataset import SceneDataset, batch_iterator  # noqa: F401
from .synthetic import synthetic_scene_list  # noqa: F401
