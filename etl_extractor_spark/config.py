"""Settings loader (X4 — reference config/settings.json:1-14).

Same shape as the reference's JSON config: source paths keyed by kind
(``*_csv``, ``api_url``), plus zone directories for the lakehouse
layout (staging / gold replace the reference's SQLite file and SQL
Server database).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class Settings:
    sources: dict[str, str] = field(default_factory=dict)
    staging_dir: str = "staging"
    gold_dir: str = "gold"
    log_path: str | None = None

    @classmethod
    def load(cls, path: str | Path) -> "Settings":
        raw = json.loads(Path(path).read_text())
        known = {"staging_dir", "gold_dir", "log_path"}
        return cls(
            sources={k: v for k, v in raw.items() if k not in known},
            **{k: raw[k] for k in known if k in raw},
        )
