from padertorch_tpu.testing.test_db import MnistDatabase
