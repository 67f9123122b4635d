from padertorch_tpu.modules.wavenet.wavenet import WaveNet, Conv
