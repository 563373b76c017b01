"""Authentication + role-based authorization for the service façades.

Reference surface (auth/authenticator.go):
- username/password auth against a versioned user file whose header pins
  ONE hash type for all records (auth/user_file.go:16-43 — magic "USRD",
  version, hash type, then length-prefixed username/hash/role records);
- two roles: ``reader`` (read-only) and ``writer`` (read+write)
  (authenticator.go:35-38); authorization is per-operation
  (server/grpc_server.go:316-318 checks before every RPC);
- constant-time hash comparison (authenticator.go:78-93 uses
  ``subtle.ConstantTimeCompare``);
- a ``NonAuthenticator`` that allows everything when auth is disabled
  (auth/nonauthenticator.go).

This rebuild keeps the semantics (single-hash-type versioned user file,
reader/writer roles, constant-time compare, allow-all fallback) with a
JSON file body instead of the binary record codec, and sha256/sha512
hashes (the reference's bcrypt mode needs a non-stdlib dependency; the
hash type is recorded per file so adding it later is a new enum value,
exactly like the reference).
"""

from __future__ import annotations

import hashlib
import hmac
import json

ROLE_READER = "reader"   # read-only operations
ROLE_WRITER = "writer"   # read + write

_HASHES = {"sha256": hashlib.sha256, "sha512": hashlib.sha512}

USER_FILE_MAGIC = "USRD"   # auth/user_file.go:18
USER_FILE_VERSION = 1


class AuthError(Exception):
    """Authentication or authorization failure (maps to gRPC
    Unauthenticated / PermissionDenied, HTTP 401 / 403)."""

    def __init__(self, message: str, denied: bool = False):
        super().__init__(message)
        self.denied = denied  # True = authenticated but not allowed (403)


def hash_password(password: str, hash_type: str = "sha256") -> str:
    try:
        return _HASHES[hash_type](password.encode()).hexdigest()
    except KeyError:
        raise ValueError(f"unsupported hash type {hash_type!r}") from None


class Authenticator:
    """Username/password authentication with reader/writer roles."""

    def __init__(self, users: dict[str, tuple[str, str]],
                 hash_type: str = "sha256"):
        """``users``: username -> (password_hash_hex, role)."""
        if hash_type not in _HASHES:
            raise ValueError(f"unsupported hash type {hash_type!r}")
        for name, (_h, role) in users.items():
            if role not in (ROLE_READER, ROLE_WRITER):
                raise ValueError(f"unknown role {role!r} for user {name!r}")
        self._users = dict(users)
        self._hash_type = hash_type

    def authenticate_userpass(self, username: str, password: str) -> str:
        """Validate credentials, return the user's role. The password is
        always hashed and compared in constant time, including for
        unknown usernames (no user-enumeration timing channel)."""
        stored_hash, role = self._users.get(username, ("0" * 64, ""))
        candidate = hash_password(password or "", self._hash_type)
        ok = hmac.compare_digest(candidate, stored_hash)
        if not ok or not role:
            raise AuthError("invalid username or password")
        return role

    @staticmethod
    def authorize(role: str, required: str) -> None:
        """Writer subsumes reader (authenticator.go Authorize)."""
        if required == ROLE_READER and role in (ROLE_READER, ROLE_WRITER):
            return
        if required == ROLE_WRITER and role == ROLE_WRITER:
            return
        raise AuthError(f"role {role!r} may not perform {required} operations",
                        denied=True)


class NonAuthenticator:
    """Allow-all authenticator used when auth is disabled
    (auth/nonauthenticator.go) — every connection gets writer."""

    def authenticate_userpass(self, username: str, password: str) -> str:
        return ROLE_WRITER

    @staticmethod
    def authorize(role: str, required: str) -> None:
        return


def write_user_file(path: str, users: dict[str, tuple[str, str]],
                    hash_type: str = "sha256") -> None:
    """``users``: username -> (PLAINTEXT password, role); hashes are
    computed here (the reference ships a user-file tool doing the same)."""
    records = [
        {"username": u, "password_hash": hash_password(pw, hash_type),
         "role": role}
        for u, (pw, role) in users.items()
    ]
    with open(path, "w") as f:
        json.dump({"magic": USER_FILE_MAGIC, "version": USER_FILE_VERSION,
                   "hash_type": hash_type, "users": records}, f, indent=1)


def read_user_file(path: str) -> Authenticator:
    with open(path) as f:
        data = json.load(f)
    if data.get("magic") != USER_FILE_MAGIC:
        raise ValueError("not a user database file (bad magic)")
    if data.get("version") != USER_FILE_VERSION:
        raise ValueError(f"unsupported user file version {data.get('version')}")
    users = {r["username"]: (r["password_hash"], r["role"])
             for r in data.get("users", [])}
    return Authenticator(users, data.get("hash_type", "sha256"))
