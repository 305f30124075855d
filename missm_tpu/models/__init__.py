from .tower import (
    init_tower_params, text_features, vision_features, tower_forward,
)
