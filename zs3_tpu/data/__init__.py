from zs3_tpu.data.classes import (
    CONTEXT_CLASSES,
    NUM_CONTEXT_CLASSES,
    NUM_VOC_CLASSES,
    VOC_CLASSES,
    seen_classes,
)
from zs3_tpu.data.embeddings import load_class_embeddings
from zs3_tpu.data.loader import DataLoader, collate, make_data_loader

__all__ = [
    "CONTEXT_CLASSES",
    "NUM_CONTEXT_CLASSES",
    "NUM_VOC_CLASSES",
    "VOC_CLASSES",
    "seen_classes",
    "load_class_embeddings",
    "DataLoader",
    "collate",
    "make_data_loader",
]
