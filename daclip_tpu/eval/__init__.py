

def parse_checkpoint_spec(spec: str):
    """Parse a --checkpoint value: "name=path", or a bare path (which may
    itself contain '=' — e.g. epoch=5.pt — so an existing file always wins).
    Returns (name, path)."""
    import os

    if "=" in spec and not os.path.exists(spec):
        name, _, path = spec.partition("=")
    else:
        name, path = "", spec
    return name or os.path.splitext(os.path.basename(path))[0], path
