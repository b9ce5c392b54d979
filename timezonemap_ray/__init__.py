"""timezonemap_ray — a Ray-Data-native spatial-join engine.

From-scratch reimplementation of the query and data-processing capabilities
of dustin-johnson/timezonemap (reference at /root/reference, v4.5) as
``ray.data.Dataset`` pipelines: batched point-in-polygon joins over Arrow
batches, a broadcast cell-cover polygon index held in actor pools, and
large-scale training-data operators (dedup, ANN, text analysis) on top.

No module in this package calls ``ray.init()`` — sessions are owned by the
driver / bench harness / test fixture.
"""

from .api import TimeZoneEngine  # noqa: F401
from .index import ZoneIndex, build_index  # noqa: F401

__version__ = "1.0"
