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


class GRU(Configurable):
    """Recurrent cell stand-in (ref ``configurable.py:3``)."""

    def __init__(self, nonlinearity='tanh'):
        self.nonlinearity = nonlinearity


class LSTM(Configurable):
    def __init__(self, peephole=False):
        self.peephole = peephole


class DenseEncoder(Configurable):
    def __init__(self, layers=2, nonlinearity='elu'):
        self.layers = layers
        self.nonlinearity = nonlinearity


class RecurrentEncoder(Configurable):
    """Nested factory demo: the recurrent cell is itself configurable
    (ref ``configurable.py:18`` — there via ``get_signature``)."""

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['recurrent'] = {'factory': GRU}

    def __init__(self, recurrent, layers=2, bidirectional=False):
        self.recurrent = recurrent
        self.layers = layers
        self.bidirectional = bidirectional


class VAE(Configurable):
    """Factory-swap demo (ref ``configurable.py:37``): the encoder
    slot accepts alternative factories, each with its own defaults —
    swapping ``factory`` on the CLI/update dict re-derives that
    factory's signature defaults plus the per-factory overrides below.

    >>> cfg = VAE.get_config()
    >>> cfg['encoder']['factory'], cfg['encoder']['layers']
    ('padertorch_tpu.contrib.examples.toy_examples.configurable.configurable_example.DenseEncoder', 3)
    >>> cfg['encoder']['nonlinearity']
    'sigmoid'
    >>> cfg = VAE.get_config({'encoder': {'factory': RecurrentEncoder}})
    >>> cfg['encoder']['layers'], cfg['encoder']['bidirectional']
    (4, False)
    >>> cfg['encoder']['recurrent']['factory']
    'padertorch_tpu.contrib.examples.toy_examples.configurable.configurable_example.GRU'
    >>> vae = VAE.from_config(
    ...     VAE.get_config({'encoder': {
    ...         'factory': RecurrentEncoder,
    ...         'recurrent': {'factory': LSTM}}}))
    >>> type(vae.encoder).__name__, type(vae.encoder.recurrent).__name__
    ('RecurrentEncoder', 'LSTM')
    """

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['encoder'] = {'factory': DenseEncoder}
        # per-factory alternative defaults (ref get_signature's
        # class-keyed dicts): only applied for the selected factory
        factory = config['encoder']['factory']
        # compare by name: under ``python -m`` the module is
        # ``__main__`` while the config stores the resolved import
        # path, so identity comparison would silently miss
        name = factory if isinstance(factory, str) else factory.__name__
        name = name.rsplit('.', 1)[-1]
        if name == 'DenseEncoder':
            config['encoder']['layers'] = 3
            config['encoder']['nonlinearity'] = 'sigmoid'
        elif name == 'RecurrentEncoder':
            config['encoder']['layers'] = 4

    def __init__(self, encoder, vae_param=2):
        self.encoder = encoder
        self.vae_param = vae_param


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
    print('\nVAE with swapped encoder factory:')
    pprint(VAE.get_config({'encoder': {'factory': RecurrentEncoder}}))


if __name__ == '__main__':
    main()
