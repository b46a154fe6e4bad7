"""Hardened local scratch directories for on-disk artifacts.

Operators that land artifacts under the world-writable system temp dir
(LSH index cache, shredded-variant scratch) share one trust discipline:

- the per-user root is created with mode 0700 via ``os.mkdir`` (never a
  symlink-following ``makedirs``/``exists`` probe);
- the root is then inspected with ``os.lstat``: a symlink planted at the
  predictable path — which would redirect writes (including
  mode('overwrite') deletes) anywhere the victim can write — is
  rejected, as is ownership by any other uid;
- callers that need run-private scratch use ``tempfile.mkdtemp`` INSIDE
  the verified root, so concurrent runs can never read or clobber each
  other's half-written artifacts.

(Round-6/7 ADVICE: predictable shared /tmp paths allowed a local-user
pre-plant/swap; ``os.stat`` follows symlinks so the uid check alone was
bypassable.)
"""

from __future__ import annotations

import os
import stat
import tempfile


def secure_private_root(name: str) -> str:
    """Return ``$TMPDIR/{name}-uid{uid}``, created 0700 and verified to
    be a real directory owned by this uid (symlinks rejected via lstat).
    Raises ``PermissionError`` when the path cannot be trusted."""
    root = os.path.join(tempfile.gettempdir(), f"{name}-uid{os.getuid()}")
    try:
        os.mkdir(root, mode=0o700)
    except FileExistsError:
        pass
    st = os.lstat(root)
    if stat.S_ISLNK(st.st_mode) or not stat.S_ISDIR(st.st_mode):
        raise PermissionError(
            f"scratch root {root!r} is not a plain directory (symlink "
            "planted?); refusing to trust or write artifacts there"
        )
    if st.st_uid != os.getuid():
        raise PermissionError(
            f"scratch root {root!r} is owned by uid {st.st_uid}, not us "
            f"({os.getuid()}); refusing to trust or write artifacts there"
        )
    return root


def private_run_dir(name: str, prefix: str = "run-") -> str:
    """A fresh, race-free, 0700 scratch directory under the verified
    per-user root — for artifacts private to one invocation."""
    return tempfile.mkdtemp(prefix=prefix, dir=secure_private_root(name))
