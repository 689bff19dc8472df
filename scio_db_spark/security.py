"""Optional TLS plumbing for the HTTP sink (SURVEY.md §2.10).

The reference materializes keystore/truststore files from Secret
Manager onto workers and builds an SSLContext for the Akka client
(``streaming/utils/dofn/ssl/SslConfig.scala:10-41``,
``SslConfigHelper.scala:9-56``,
``http/clients/akka/AkkaSSLContextFromSecretManager.scala:16-56``,
``utils/gcp/SecretManagerClient.scala:8-31``).

Spark-first port: a ``secret_provider`` is any ``Callable[[str],
bytes]`` (cloud secret manager, vault, env, file); the factory writes
the PEM material to the executor-local filesystem once per Python
worker and returns a stdlib ``ssl.SSLContext``. JKS/P12 keystores are
a JVM concept — the Python client consumes PEM; converting is a
deploy-time step, so requesting one raises with a clear message.
"""

from __future__ import annotations

import os
import ssl
import tempfile
import threading
from collections import OrderedDict
from collections.abc import Callable

_lock = threading.Lock()
#: LRU-bounded (hits refresh recency): one entry per (provider,
#: secret-names) combination; a rotation scheme that builds a fresh
#: provider per rotation evicts the least-recently-used predecessors
#: instead of growing without bound.
_CACHE_MAX = 32
_cached: OrderedDict[tuple, ssl.SSLContext] = OrderedDict()


def env_secret_provider(name: str) -> bytes:
    """Smallest provider: secrets from environment variables."""
    val = os.environ.get(name)
    if val is None:
        raise KeyError(f"secret {name!r} not present in environment")
    return val.encode()


def build_ssl_context(
    secret_provider: Callable[[str], bytes] | None = None,
    ca_secret: str | None = None,
    client_cert_secret: str | None = None,
    client_key_secret: str | None = None,
) -> ssl.SSLContext:
    """SslConfigHelper analogue: per-worker cached SSLContext.

    With no arguments returns the system-default context. Secrets must
    be PEM; JKS/P12 material (the reference's keystore format) must be
    converted at deploy time.
    """
    secrets = (ca_secret, client_cert_secret, client_key_secret)
    if any(secrets) and secret_provider is None:
        raise ValueError(
            "secret names given but no secret_provider — the context "
            "would silently lack the requested material"
        )
    # Cache key holds the provider OBJECT (not id()): the dict's strong
    # reference keeps it alive, so a collected provider's id can never
    # be recycled onto a different provider and serve a stale context.
    # The cache is FIFO-bounded (_CACHE_MAX) so per-rotation providers
    # can't accumulate contexts forever; an unhashable provider (e.g. a
    # class defining __eq__ without __hash__) skips the cache entirely
    # and gets a freshly built context each call.
    # Half a client pair is a caller bug, and a context silently built
    # WITHOUT the requested client auth would attempt mTLS endpoints
    # unauthenticated — fail loudly, like the secrets-without-provider
    # guard above.
    if (client_cert_secret is None) != (client_key_secret is None):
        raise ValueError(
            "client_cert_secret and client_key_secret must be given "
            "together (got only one of the pair)"
        )
    key: tuple | None = (secret_provider, *secrets)
    try:
        hash(key)
    except TypeError:
        key = None
    # Cache probe under the lock; the BUILD (secret-provider network
    # I/O) runs OUTSIDE it — one slow or hung secret-manager call must
    # not block every thread's cache HITS. The race is benign: two
    # threads may build the same context once each, last insert wins.
    with _lock:
        if key is not None and key in _cached:
            _cached.move_to_end(key)
            return _cached[key]
    if any(
        s and s.lower().endswith((".jks", ".p12"))
        for s in secrets if s
    ):
        raise NotImplementedError(
            "JKS/P12 keystores are JVM-format; convert to PEM at "
            "deploy time (openssl pkcs12 ...) and point the secret "
            "at the PEM"
        )
    ctx = ssl.create_default_context()
    if secret_provider is not None and ca_secret is not None:
        ctx.load_verify_locations(
            cadata=secret_provider(ca_secret).decode()
        )
    if (
        secret_provider is not None
        and client_cert_secret is not None
        and client_key_secret is not None
    ):
        # load_cert_chain requires files: materialize worker-local
        # (the reference writes keystores to the worker fs the same
        # way, SslConfigHelper.scala:9-56).
        d = tempfile.mkdtemp(prefix="sslmat_")
        cert_p = os.path.join(d, "client.pem")
        key_p = os.path.join(d, "client.key")
        with open(cert_p, "wb") as fh:
            fh.write(secret_provider(client_cert_secret))
        with open(key_p, "wb") as fh:
            fh.write(secret_provider(client_key_secret))
        os.chmod(key_p, 0o600)
        ctx.load_cert_chain(cert_p, key_p)
    if key is not None:
        with _lock:
            _cached[key] = ctx
            while len(_cached) > _CACHE_MAX:
                _cached.popitem(last=False)
    return ctx
