"""Dataset splits; the split is the leaf folder name (reference split.py)."""
from enum import Enum


class Split(Enum):
    TRAIN = "training"
    TEST = "testing"
