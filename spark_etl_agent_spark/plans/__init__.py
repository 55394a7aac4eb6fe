from .jcap_extract import (
    derive_alignment,
    derive_payer_details,
    derive_ref_cap,
    derive_segment,
    jcap_extract,
    jcap_transform,
)

__all__ = [
    "derive_alignment",
    "derive_payer_details",
    "derive_ref_cap",
    "derive_segment",
    "jcap_extract",
    "jcap_transform",
]
