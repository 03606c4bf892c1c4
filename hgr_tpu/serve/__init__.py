from hgr_tpu.serve.engine import (  # noqa: F401
    ClassifierService,
    DetectorService,
    MicroBatcher,
    ServeMetrics,
)
