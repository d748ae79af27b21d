"""Driver-mandated extension operators (SURVEY.md §2.8): dedup,
similarity search, text analysis, multimodal - registered incrementally.
"""

from __future__ import annotations
