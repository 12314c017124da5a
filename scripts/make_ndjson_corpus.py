"""Regenerate the exampleDataset as NDJSON records (the reference's
exampleDatasetAsNdjson flavor, produced the same way in its CI).

  python scripts/make_ndjson_corpus.py <exampleDataset dir> <out.ndjson>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from tests.test_ndjson_path import _generate_ndjson  # noqa: E402

if __name__ == "__main__":
    _generate_ndjson(sys.argv[1], sys.argv[2])
    print(f"wrote {sys.argv[2]}")
