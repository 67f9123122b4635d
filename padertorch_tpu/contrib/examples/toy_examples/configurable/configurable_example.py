"""Configurable usage demos.

Reference parity: ``contrib/examples/toy_examples/configurable/`` —
demonstrates nested factories, dogmatic updates and shared parameters.

Run:
    python -m padertorch_tpu.contrib.examples.toy_examples.configurable.configurable_example
"""
from padertorch_tpu import Configurable
from padertorch_tpu import nn


class Encoder(Configurable):
    def __init__(self, in_features, hidden=16):
        self.net = nn.Linear(in_features, hidden)
        self.hidden = hidden


class Decoder(Configurable):
    def __init__(self, hidden, out_features=4):
        self.net = nn.Linear(hidden, out_features)


class Autoencoder(Configurable):
    """Shared parameter demo: the decoder input tracks the encoder size."""

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['encoder'] = {'factory': Encoder, 'in_features': 8}
        config['decoder'] = {
            'factory': Decoder,
            # dependent entry: follows encoder updates dogmatically
            'hidden': config['encoder']['hidden'],
        }

    def __init__(self, encoder, decoder):
        self.encoder = encoder
        self.decoder = decoder


def main():
    from pprint import pprint
    print('Default config:')
    pprint(Autoencoder.get_config())
    print('\nUpdated config (hidden=32 propagates to the decoder):')
    config = Autoencoder.get_config({'encoder': {'hidden': 32}})
    pprint(config)
    assert config['decoder']['hidden'] == 32
    ae = Autoencoder.from_config(config)
    print('\nInstance:', type(ae).__name__,
          'decoder in_features =', ae.decoder.net.in_features)


if __name__ == '__main__':
    main()
