from .common import MLP, GRUCell, StackedGRU  # noqa: F401
from .cnn import MapEncoder  # noqa: F401
from .interaction import SceneInteractionNet  # noqa: F401
from .traffic_model import TrafficModel  # noqa: F401
