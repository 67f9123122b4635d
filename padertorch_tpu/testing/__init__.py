from padertorch_tpu.testing.test_db import MnistDatabase
from padertorch_tpu.testing.windows import skip_on_windows
