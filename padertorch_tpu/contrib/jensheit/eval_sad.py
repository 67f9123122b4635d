"""Sample-level SAD (speech activity detection) evaluation with
buffer zones.

Reference parity: ``padertorch/contrib/jensheit/eval_sad.py`` —
``smooth_vad`` (:5, threshold + majority smoothing over a sliding
window), ``adjust_annotation_fn`` (:30, marks a buffer zone of
``buffer_zone`` seconds around each speech segment with label 5 so
those samples are excluded from scoring), ``get_tp_fp_tn_fn`` (:65,
sample-level confusion counts with the 5-labeled zone unscored) and
``evaluate_model`` (:120, multi-threshold sweep over a dataset with
MPI-style fan-out).

Note on the start-side buffer: the reference's executable code drops
the buffer *before* each segment (``eval_sad.py:57``'s
``min(start - buffer_zone, 0)`` produces an empty slice), which
contradicts its own docstring examples; this port implements the
documented symmetric behavior (buffer on both sides), matching the
reference's doctests at ``eval_sad.py:39-44``.
"""
import numpy as np

__all__ = ['smooth_vad', 'adjust_annotation_fn', 'get_tp_fp_tn_fn',
           'evaluate_model']

UNSCORED = 5  # label marking buffer-zone samples excluded from scoring


def smooth_vad(vad_pred, threshold=0.1, window=25, divisor=1):
    """Binarize + majority-smooth soft SAD predictions.

    A sample is voice-active after smoothing when at least
    ``(window // 2) // divisor`` samples in the centered window were
    active before.

    >>> vad_pred = np.array([.1, .2, .3, .4, .5, .6, .7, .2, .1])
    >>> smooth_vad(vad_pred, window=3, divisor=1, threshold=0.3)
    array([0., 0., 1., 1., 1., 1., 1., 1., 0.])
    >>> smooth_vad(vad_pred, window=5, divisor=1, threshold=0.5)
    array([0., 0., 0., 0., 1., 1., 1., 1., 0.])
    >>> smooth_vad(vad_pred, window=5, divisor=2, threshold=0.5)
    array([0., 0., 0., 1., 1., 1., 1., 1., 1.])
    >>> smooth_vad(vad_pred[None, None], window=5, divisor=2,
    ...            threshold=0.5)
    array([[[0., 0., 0., 1., 1., 1., 1., 1., 1.]]])
    """
    vad_pred = np.asarray(vad_pred, float).copy()
    binary = (vad_pred > threshold).astype(float)
    shift = window // 2
    padding = [(0, 0)] * (binary.ndim - 1) + [(shift, shift)]
    padded = np.pad(binary, padding, 'edge')
    # sliding window sum at stride 1 over the last axis
    cumsum = np.cumsum(
        np.pad(padded, [(0, 0)] * (binary.ndim - 1) + [(1, 0)]),
        axis=-1)
    n = binary.shape[-1]
    counts = cumsum[..., window:window + n] - cumsum[..., :n]
    return (counts >= shift // divisor).astype(float)


def adjust_annotation_fn(annotation, sample_rate, buffer_zone=1.):
    """Mark ``buffer_zone`` seconds around every speech segment as
    UNSCORED (5) unless the samples are themselves speech.

    >>> annotation = np.array([0, 1, 1, 1, 0, 0, 0, 1])
    >>> adjust_annotation_fn(annotation, 1)
    array([5, 1, 1, 1, 5, 0, 5, 1], dtype=int32)
    >>> adjust_annotation_fn(annotation, 2)
    array([5, 1, 1, 1, 5, 5, 5, 1], dtype=int32)
    >>> adjust_annotation_fn(np.zeros(4, int), 2)
    array([0, 0, 0, 0])
    """
    annotation = np.asarray(annotation)
    buffer = int(buffer_zone * sample_rate)
    edges = np.where(annotation[:-1] != annotation[1:])[0] + 1
    if len(edges) == 0:
        return annotation
    starts = list(edges[::2] if annotation[0] == 0 else
                  np.r_[0, edges[1::2]])
    ends = list(edges[1::2] if annotation[0] == 0 else edges[::2])
    if len(ends) < len(starts):
        ends.append(len(annotation))
    out = annotation.astype(np.int32)
    for s, e in zip(starts, ends):
        for sl in (slice(max(s - buffer, 0), s),
                   slice(e, e + buffer)):
            region = out[sl]
            region[region != 1] = UNSCORED
    return out


def get_tp_fp_tn_fn(annotation, vad, sample_rate=8000,
                    adjust_annotation=True):
    """Sample-level confusion counts; buffer-zone samples (label 5 in
    the adjusted annotation) are not scored.

    >>> annotation = np.array([0, 1, 1, 1, 0, 0, 0, 1])
    >>> get_tp_fp_tn_fn(annotation, annotation, 1, False)
    (4, 0, 4, 0)
    >>> vad = np.array([1, 1, 1, 1, 0, 0, 0, 1])
    >>> get_tp_fp_tn_fn(annotation, vad, 1, True)
    (4, 0, 1, 0)
    >>> vad = np.array([0, 1, 1, 1, 0, 1, 0, 1])
    >>> get_tp_fp_tn_fn(annotation, vad, 1, False)
    (4, 1, 3, 0)
    """
    annotation = np.asarray(annotation)
    vad = np.asarray(vad)
    assert len(annotation) == len(vad), (len(annotation), len(vad))
    assert annotation.ndim == 1, annotation.shape
    assert vad.ndim == 1, vad.shape
    if adjust_annotation:
        annotation = adjust_annotation_fn(annotation, sample_rate)
    result = np.round(vad).astype(np.int32) * 10 \
        + annotation.astype(np.int32)
    tp = int((result == 11).sum())
    fp = int((result == 10).sum())
    tn = int((result == 0).sum())
    fn = int((result == 1).sum())
    return tp, fp, tn, fn


def evaluate_model(dataset, model, get_sad_fn,
                   get_target_fn=lambda x: x['activation'],
                   num_thresholds=201, buffer_zone=0.5,
                   sample_rate=8000):
    """Multi-threshold SAD sweep over a dataset
    (ref ``eval_sad.py:120``).

    For every example: adjust the annotation once, run the model once,
    then accumulate (tp, fp, tn, fn) for ``num_thresholds`` decision
    thresholds in [0, 1].  Under the repo's file-based multi-process
    evaluation (``PT_EVAL_RANK``/``PT_EVAL_SIZE``), each process scores
    its strided share and the counts are summed across processes.

    Returns the (num_thresholds, 4) count matrix on rank 0 (and on
    single-process runs); other ranks return None.
    """
    from padertorch_tpu.evaluation import parallel as pt_parallel

    tp_fp_tn_fn = np.zeros((num_thresholds, 4), dtype=int)
    thresholds = np.round(np.linspace(0, 1, num_thresholds), 2)

    for example in pt_parallel.split_managed(dataset):
        target = np.asarray(get_target_fn(example))
        adjusted = adjust_annotation_fn(
            target, buffer_zone=buffer_zone, sample_rate=sample_rate)
        model_out = model(example)
        for idx, th in enumerate(thresholds):
            sad = get_sad_fn(model_out, th, example)
            counts = get_tp_fp_tn_fn(
                adjusted, sad, sample_rate=sample_rate,
                adjust_annotation=False)
            tp_fp_tn_fn[idx] += np.asarray(counts)

    gathered = pt_parallel.gather(tp_fp_tn_fn)
    if gathered is None:
        return None
    return np.sum(np.asarray(gathered), axis=0)
