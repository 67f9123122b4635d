from padertorch_tpu.data.batch import example_to_device, example_to_numpy, Sorter
from padertorch_tpu.data.utils import collate_fn, pad_tensor, pad_batch, pad_to_multiple
