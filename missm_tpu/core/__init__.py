from .config import TowerConfig, TextConfig, VisionConfig, MODALITY_CODES
from .mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from .prng import PRNGSeq
