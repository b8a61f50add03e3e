"""Small host-side utilities: logging, compile-cache setup."""
