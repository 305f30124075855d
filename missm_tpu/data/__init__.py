from .missing import simulate_missing_modality, generate_missing_index
from .tokenizer import ClipBpeTokenizer, HashTokenizer
