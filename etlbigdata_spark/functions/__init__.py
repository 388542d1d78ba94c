from . import dedup, multimodal, similarity, text
