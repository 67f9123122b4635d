"""Shared-parameter demo: one value flows into several sub-configs.

Reference parity:
``contrib/examples/toy_examples/configurable/shared_parameter.py`` — a
``Compose`` whose ``sample_rate`` is pushed into both of its layers, and
a ``Model`` that overrides it from the outside (there driven by sacred;
here by ``pt.cli`` overrides).

The dogmatic contract makes the sharing one-directional and
override-safe: assignments in ``finalize_dogmatic_config`` provide
defaults, user updates outrank them, and the *dependent* entries below
read the (possibly updated) shared value.

>>> from pprint import pprint
>>> config = Model.get_config()
>>> config['transform']['layer1']['sample_rate']
8000
>>> config = Model.get_config(
...     {'transform': {'sample_rate': 44100}})
>>> (config['transform']['layer1']['sample_rate'],
...  config['transform']['layer2']['sample_rate'])
(44100, 44100)

Run:
    python -m padertorch_tpu.contrib.examples.toy_examples.configurable.shared_parameter \\
        with transform.sample_rate=44100
"""
import sys

from padertorch_tpu import Configurable


class Load(Configurable):
    def __init__(self, sample_rate=16000):
        self.sample_rate = sample_rate

    def __call__(self, value):
        print(type(self).__name__, value, self.sample_rate)
        return value + 5


class FeatureExtractor(Configurable):
    def __init__(self, sample_rate=16000):
        self.sample_rate = sample_rate

    def __call__(self, value):
        print(type(self).__name__, value, self.sample_rate)
        return value + 7


class Compose(Configurable):
    """``sample_rate`` is shared: both layers inherit this one value."""

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['layer1'] = {
            'factory': Load,
            'sample_rate': config['sample_rate'],
        }
        config['layer2'] = {
            'factory': FeatureExtractor,
            'sample_rate': config['sample_rate'],
        }

    def __init__(self, layer1, layer2, sample_rate=8000):
        self.layer1 = layer1
        self.layer2 = layer2
        self.sample_rate = sample_rate

    def __call__(self, value):
        print(type(self).__name__, value)
        return self.layer2(self.layer1(value)) + 11


class Model(Configurable):
    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['transform'] = {'factory': Compose}

    def __init__(self, transform):
        self.transform = transform


def main(argv=None):
    from pprint import pprint
    from padertorch_tpu.cli import parse_with_updates

    updates, named = parse_with_updates(
        sys.argv[1:] if argv is None else argv)
    assert not named, named
    config = Model.get_config({'transform': updates.get('transform', {})})
    print('Config:')
    pprint(config)
    model = Model.from_config(config)
    print('\ntransform(1) =', model.transform(1))
    assert (model.transform.layer1.sample_rate
            == model.transform.layer2.sample_rate
            == model.transform.sample_rate)


if __name__ == '__main__':
    main()
