"""Compatibility aggregator for the text query family (VERDICT r9 #7):
the 3,300-line module is split by sub-family — language-model/token
operators in ``text_lm``, quality/lang-ID/PII/decontamination in
``text_quality``, search/retrieval in ``text_retrieval``, and
dataset-assembly (splits/mixing/packing/shards) in ``text_datasets``.
Importing THIS module (as the registry loader and older call sites do)
pulls in all four, so registered names, import paths, and load order
are unchanged; new code should import the sub-family module directly."""

from __future__ import annotations

# NOTE: each sub-family module binds ..catalog.load_table at ITS OWN
# import — patching a name on THIS aggregator affects nothing. Test
# fakes must patch the owning module (e.g. text_retrieval.load_table,
# as tests/test_properties.py does).
from .text_lm import *  # noqa: F401,F403
from .text_quality import *  # noqa: F401,F403
from .text_retrieval import *  # noqa: F401,F403
from .text_datasets import *  # noqa: F401,F403
from .text_lm import _spread_docs, _BPE_PATTERN, _BPE_SQL  # noqa: F401
