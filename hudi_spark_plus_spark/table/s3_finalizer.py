"""S3-semantics binding of the conditional-write commit finalizer.

``HttpConditionalPutFinalizer`` (commit_log.py) publishes a commit as
one HTTP PUT carrying ``If-None-Match: *`` and treats any 409/412 as
"the key exists". That is correct for GCS/Azure, but S3's conditional
writes (GA Nov 2024) distinguish two rejections the generic binding
conflates:

* ``412 PreconditionFailed`` — the key EXISTS. Terminal: some writer
  won this version; our optimistic-concurrency answer is
  ``CommitConflict`` (re-read the timeline, retry the operation at the
  next version).
* ``409 ConditionalRequestConflict`` — a CONCURRENT conditional
  operation on the same key was in flight and S3 rejected this request
  without deciding it. The key may or may not exist; AWS documents the
  remedy as "retry the request". Mapping it to "exists" is SAFE for
  commit integrity (the caller re-reads and retries the whole
  operation) but wrong under contention: when the racing writer ALSO
  got 409'd, every writer aborts a version nobody published and the
  table makes no progress until the application-level retry loop wins
  a quiet moment.

``S3ConditionalPutFinalizer`` therefore retries the conditional PUT on
409 with jittered exponential backoff, bounded by ``conflict_retries``:
each retry re-sends the same ``If-None-Match: *`` precondition, so the
outcome converges to 2xx (we won) or 412 (someone else did) — the two
answers the commit protocol actually needs. A still-409-after-retries
raises ``CommitConflict`` (safe: re-read and retry the operation; never
an overwrite). HTTP 5xx/timeouts follow the same bounded retry — a
commit publish is idempotent-by-precondition, so re-sending can never
double-publish — but unlike a 409 they are AMBIGUOUS: a 502/504 from a
gateway can mask a PUT the upstream store applied, so any later 412 (or
exhaustion) after a 5xx resolves through the read-back comparison
instead of concluding CommitConflict outright.

Production deployment is this class plus request signing: pass
``sign=`` a callable that adds the provider's auth headers to each
request (e.g. SigV4 via a signing sidecar or instance-profile
credential helper). The in-suite S3 façade (tests/test_s3_finalizer.py)
drives the full protocol — XML error bodies, ETag on success, injected
ConditionalRequestConflict storms — through real HTTP round trips, and
a LakeTable concurrent-merge soak proves commit integrity end-to-end
when every publish crosses this binding.
"""

from __future__ import annotations

import http.client
import random
import time
import urllib.error
import urllib.request

from hudi_spark_plus_spark.table.commit_log import (
    CommitConflict,
    ConditionalPutFinalizer,
)


class S3ConditionalPutFinalizer(ConditionalPutFinalizer):
    def __init__(
        self,
        url_of,
        timeout: float = 10.0,
        conflict_retries: int = 6,
        backoff_base_s: float = 0.05,
        sign=None,
    ):
        self.url_of = url_of
        self.timeout = timeout
        self.conflict_retries = conflict_retries
        self.backoff_base_s = backoff_base_s
        self.sign = sign

    def _attempt(self, url: str, payload: bytes) -> object:
        """One conditional PUT. True = created, False = exists (412),
        "rejected" = the store REFUSED the request without applying it
        (409 ConditionalRequestConflict) — safe to retry, nothing was
        written; "unknown" = the PUT may have been DELIVERED but the
        outcome is unconfirmed: network-layer loss, or ANY 5xx — a
        502/504 is typically a gateway/proxy speaking for an upstream
        that may already have applied the write (ADVICE r11 #2), and
        even a store-originated 500 gives no applied/not-applied
        guarantee, so all 5xx are classified conservatively. The
        distinction matters at exhaustion and on a later 412: a run of
        pure rejections can safely conclude CommitConflict, a run
        containing an unknown must go through the read-back comparison
        (see put_if_absent)."""
        req = urllib.request.Request(
            url,
            data=payload,
            method="PUT",
            headers={
                "If-None-Match": "*",
                "Content-Type": "application/json",
            },
        )
        if self.sign is not None:
            self.sign(req)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return 200 <= resp.status < 300
        except urllib.error.HTTPError as e:
            if e.code == 412:
                return False
            if e.code == 409:
                return "rejected"
            if e.code >= 500:
                return "unknown"
            raise
        except (OSError, TimeoutError, http.client.HTTPException):
            # network-layer loss (connection reset/dropped mid-response,
            # DNS blip, timeout): the PUT may or may not have been
            # delivered — ambiguous, retry under the If-None-Match guard
            return "unknown"

    def _read_back(self, url: str) -> object:
        """bytes = object content, "absent" = key definitely does not
        exist (404 — our PUT was NOT delivered), None = unreachable
        (undecidable)."""
        req = urllib.request.Request(url, method="GET")
        if self.sign is not None:
            self.sign(req)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            return "absent" if e.code == 404 else None
        except (OSError, TimeoutError, http.client.HTTPException):
            return None

    def _undecidable(self, url: str) -> RuntimeError:
        # Deliberately NOT CommitConflict — commit() reacts to that by
        # reclaiming this attempt's segments, which corrupts the table
        # if a lost PUT actually landed. Surface loudly and leave state
        # for reconciliation.
        return RuntimeError(
            f"publish outcome unknown for {url}: a PUT may have been "
            "delivered but the confirming read failed; reconcile the "
            "timeline before retrying (segments were intentionally not "
            "reclaimed)"
        )

    def put_if_absent(self, target: str, content: str) -> bool:
        url = self.url_of(target)
        payload = content.encode("utf-8")
        ambiguous = False  # a lost response may have delivered our PUT
        for attempt in range(self.conflict_retries + 1):
            out = self._attempt(url, payload)
            if out is False and ambiguous:
                # THE retry trap: if an earlier attempt's 2xx was lost
                # in transit (timeout after server-side success), this
                # 412 may be rejecting our OWN object. Reporting
                # "exists" would make commit() reclaim the segments a
                # PUBLISHED commit references — read back and compare:
                # commit payloads embed fresh uuid segment paths, so
                # equality means we won.
                got = self._read_back(url)
                if got == payload:
                    return True
                if got is None:
                    raise self._undecidable(url)
                return False  # someone else's bytes: genuine conflict
            if out is True or out is False:
                return out
            if out == "unknown":
                ambiguous = True
            if attempt < self.conflict_retries:
                # jittered exponential backoff: contending writers must
                # not re-collide in lockstep (the 409 storm that
                # motivated the retry loop)
                time.sleep(
                    self.backoff_base_s
                    * (2**attempt)
                    * (0.5 + random.random())
                )
        if ambiguous:
            # exhaustion with a possibly-delivered PUT in the run: the
            # same trap as the 412 branch — raising CommitConflict here
            # would reclaim segments a published commit may reference.
            # One read-back decides it; unreachable stays undecidable.
            got = self._read_back(url)
            if got == payload:
                return True
            if got == "absent" or isinstance(got, bytes):
                # key absent (our PUT never landed) or someone else's
                # bytes: this attempt definitively did not publish
                raise CommitConflict(
                    f"commit publish to {url} did not land after "
                    f"{self.conflict_retries + 1} attempts; re-read the "
                    "timeline and retry the operation"
                )
            raise self._undecidable(url)
        raise CommitConflict(
            f"commit publish to {url} still rejected as a concurrent "
            f"conditional-request conflict after "
            f"{self.conflict_retries + 1} attempts; re-read the timeline "
            "and retry the operation"
        )
