"""Small helpers (utils.py equivalents)."""


def readlines(path):
    with open(path) as f:
        return [line.rstrip() for line in f if line.rstrip()]


def sec_to_hm_str(t: float) -> str:
    """10239 -> '02h50m39s'."""
    t = int(t)
    s = t % 60
    t //= 60
    m = t % 60
    t //= 60
    return f"{t:02d}h{m:02d}m{s:02d}s"
