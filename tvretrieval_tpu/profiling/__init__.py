from tvretrieval_tpu.profiling.profile_models import (
    ProfileXML,
    index_storage_gb,
)

__all__ = ["ProfileXML", "index_storage_gb"]
