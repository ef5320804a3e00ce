from .hash_scan import hash_scan_pallas

__all__ = ["hash_scan_pallas"]
