"""Evaluate a trained uPIT model: masking + iSTFT + SI-SDR/BSS-eval.

Reference parity: ``contrib/examples/source_separation/pit/evaluate.py``
(MPI fan-out becomes the host-level evaluation queue of
``padertorch_tpu.evaluation.parallel``).

Run:
    python -m padertorch_tpu.contrib.examples.source_separation.pit.evaluate \
        --model_path /path/to/storage_dir [--synthetic]
"""
import argparse
import json
from pathlib import Path

import numpy as np

from padertorch_tpu.models.bss import PermutationInvariantTrainingModel
from padertorch_tpu.evaluation import (
    InputMetrics, OutputMetrics, split_managed, gather_merged, is_master,
)
from padertorch_tpu.contrib.neumann.evaluation import compute_means
from padertorch_tpu.ops._stft import HostSTFT as STFT

from . import data


def evaluate_example(model, stft, example):
    features = data.pre_batch_transform(example)
    batch = data.post_batch_transform([features])
    mask = np.asarray(model(batch))[0]  # (T, K, F)
    obs_stft = np.asarray(stft(example['observation']))  # (T, F)
    # fused mask + synthesis: on a TPU backend this is ONE Pallas
    # kernel (mask multiply + iSTFT overlap-add, the masked
    # spectrogram never materializes — ops/pallas/masked_istft.py);
    # elsewhere the equivalent numpy composition
    estimates = np.asarray(stft.masked_inverse(
        obs_stft, mask.transpose(1, 0, 2), backend='auto'))
    t = example['observation'].shape[-1]
    estimates = estimates[..., :t]
    sources = np.asarray(example['speech_source'])[..., :t]

    input_metrics = InputMetrics(
        observation=example['observation'][:t],
        speech_source=sources,
    ).as_dict()
    output_metrics = OutputMetrics(
        speech_prediction=estimates,
        speech_source=sources,
    ).as_dict()
    return example['example_id'], {
        **{f'input_{k}': v.tolist() for k, v in input_metrics.items()},
        **{f'output_{k}': v.tolist() for k, v in output_metrics.items()},
        **{
            f'improvement_{k}': (
                np.asarray(output_metrics[k])
                - np.asarray(input_metrics[k])).mean().tolist()
            for k in output_metrics
        },
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model_path', required=True)
    parser.add_argument('--database', default=None)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--dataset', default='mix_2_spk_min_tt')
    args = parser.parse_args()

    model_path = Path(args.model_path)
    model = PermutationInvariantTrainingModel.from_storage_dir(
        model_path, checkpoint_name='ckpt_best_loss.ptt')
    model = model.eval()

    stft = STFT(data.STFT_SIZE, data.STFT_SHIFT, fading='full',
                complex_representation='complex', dtype='float32')

    if args.synthetic or args.database is None:
        dataset = data.synthetic_database(num_examples=8, seed=2)
    else:
        from padertorch_tpu.data.database import JsonDatabase
        dataset = JsonDatabase(args.database).get_dataset(
            args.dataset).map(data.read_audio)

    results = {}
    for example in split_managed(dataset, progress_bar=True):
        example_id, metrics = evaluate_example(model, stft, example)
        results[example_id] = metrics

    results = gather_merged(results)
    if is_master():
        out_dir = model_path / 'eval'
        out_dir.mkdir(exist_ok=True)
        (out_dir / 'result.json').write_text(json.dumps(results, indent=2))
        means = compute_means(results)
        (out_dir / 'means.json').write_text(json.dumps(means, indent=2))
        print(json.dumps(means, indent=2))


if __name__ == '__main__':
    main()
