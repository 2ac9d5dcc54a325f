"""Input pipeline: split readers, KITTI & friends datasets, host-side
augmentation, fixed-shape batching with device prefetch."""

from tripled_tpu.data.readers import readlines, split_file_path
from tripled_tpu.data.pipeline import BatchLoader, prefetch_to_device
from tripled_tpu.data.get_dataset import get_dataset
