"""Compatibility aggregator for the events query family (VERDICT r9
#7): the 3,300-line module is split by sub-family — core batch analytics in
``events_batch``, rolling/trend/statistics batch analytics in
``events_trends`` (round 11), Structured-Streaming drains + the file-source staging
harness in ``events_streaming``. Importing THIS module (as the registry
loader and older call sites do) pulls in both, so registered names,
import paths, and load order are unchanged; new code should import the
sub-family module directly."""

from __future__ import annotations

from .events_batch import *  # noqa: F401,F403
from .events_trends import *  # noqa: F401,F403
from .events_streaming import *  # noqa: F401,F403
from .events_streaming import (  # noqa: F401  (underscore names skip *)
    STREAM_SLICE_ROWS,
    _adaptive_slices,
    _events_arrow_us,
    _stage_events,
)
