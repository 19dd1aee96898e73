from .data import Sequence, SequenceList, BaseDataset
from .datasets import get_dataset
