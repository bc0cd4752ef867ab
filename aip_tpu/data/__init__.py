"""Host-side data loading."""

from aip_tpu.data.images import FlatFolderDataset, infinite_batches, train_transform
