"""Read back tfevents files written by the SummaryHook.

Reference parity: ``padertorch/summary/tfevents.py:26`` — there the binary
record framing is hand-parsed; here the record framing is parsed manually
(the format is [uint64 length][uint32 masked crc32c][payload][uint32 crc])
and the payload is decoded with tensorboardX's bundled Event proto.

Used by the framework's own tests to assert which tags a training wrote.
"""
import struct
from pathlib import Path

__all__ = ['load_events_as_dict']


def _iter_records(path):
    data = Path(path).read_bytes()
    offset = 0
    n = len(data)
    while offset + 12 <= n:
        (length,) = struct.unpack_from('<Q', data, offset)
        offset += 8 + 4  # length + length crc
        payload = data[offset:offset + length]
        offset += length + 4  # payload + payload crc
        yield payload


def load_events_as_dict(path):
    """Return a list of event dicts (keys like wall_time, step, summary)."""
    from tensorboardX.proto import event_pb2
    try:
        from google.protobuf.json_format import MessageToDict
    except ImportError:  # pragma: no cover
        MessageToDict = None

    events = []
    for payload in _iter_records(path):
        event = event_pb2.Event()
        event.ParseFromString(payload)
        if MessageToDict is not None:
            d = MessageToDict(
                event,
                preserving_proto_field_name=True,
                always_print_fields_with_no_presence=False,
            )
        else:  # pragma: no cover
            d = {'summary': {'value': [
                {'tag': v.tag, 'simple_value': v.simple_value}
                for v in event.summary.value
            ]}} if event.HasField('summary') else {}
            d['step'] = event.step
            d['wall_time'] = event.wall_time
        events.append(d)
    return events


def scalars_from_events(path):
    """Convenience: ``{tag: [(step, value), ...]}`` for scalar events."""
    out = {}
    for event in load_events_as_dict(path):
        for value in event.get('summary', {}).get('value', []):
            if 'simple_value' in value:
                out.setdefault(value['tag'], []).append(
                    (int(event.get('step', 0)), value['simple_value']))
    return out
