from padertorch_tpu.modules.fully_connected import fully_connected_stack
from padertorch_tpu.modules.normalization import (
    Normalization, InputNormalization,
)
from padertorch_tpu.modules.recurrent import LSTM, GRU, StatefulLSTM
from padertorch_tpu.modules.convnet import ConvNet
from padertorch_tpu.modules.dual_path_rnn import DPRNN, DPRNNBlock
from padertorch_tpu.modules.dual_path_transformer import (
    DualPathTransformer, DualPathTransformerBlock,
)
from padertorch_tpu.modules.conformer import (
    ConformerBlock, ConformerConvModule, ConformerEncoder,
)
