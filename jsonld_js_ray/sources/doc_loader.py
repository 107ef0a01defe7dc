"""Document-loader semantics over an INJECTED transport (no network).

Re-expresses the reference's node HTTPS loader behavior
(/root/reference/lib/documentLoaders/node.js:34-189) — scheme and
secure-mode checks, HTTP error mapping, Link-header context discovery,
``alternate``-link and 3xx redirect following with loop detection and
``maxRedirects``, header building with the fixed Accept value — plus the
concurrent same-URL coalescing of ``RequestQueue``
(/root/reference/lib/RequestQueue.js:6-38) and the Link-header parser
(/root/reference/lib/util.js:88-146).

The network itself is DELIBERATELY not here: callers inject
``transport(url, headers) -> (status, response_headers, body)`` (tests
use in-memory fakes; a deployment would wrap ``urllib``/``httpx``).
That keeps every redirect/Link/content-type rule unit-testable in this
sandbox while preserving the reference's observable contract.
"""

from __future__ import annotations

import re
import threading
from typing import Any, Callable

from ..core.errors import JsonLdError
from ..core.url import prepend_base

LINK_HEADER_CONTEXT = "http://www.w3.org/ns/json-ld#context"
DEFAULT_ACCEPT = "application/ld+json, application/json"

_REGEX_LINK_HEADERS = re.compile(r'(?:<[^>]*?>|"[^"]*?"|[^,])+')
_REGEX_LINK_HEADER = re.compile(r"\s*<([^>]*?)>\s*(?:;\s*(.*))?")
_REGEX_LINK_HEADER_PARAMS = re.compile(
    r'(.*?)=(?:(?:"([^"]*?)")|([^"]*?))\s*(?:(?:;\s*)|$)')

# transport(url, headers) -> (status:int, headers:dict[str,str], body)
Transport = Callable[[str, dict], tuple[int, dict, Any]]


def build_headers(headers: dict | None = None) -> dict:
    """util.js buildHeaders: Accept may not be overridden."""
    headers = headers or {}
    if any(h.lower() == "accept" for h in headers):
        raise ValueError(
            'Accept header may not be specified; only "'
            + DEFAULT_ACCEPT + '" is supported.')
    return {"Accept": DEFAULT_ACCEPT, **headers}


def parse_link_header(header: str) -> dict:
    """util.js parseLinkHeader: entries keyed by rel (lists on dup)."""
    rval: dict = {}
    for entry in _REGEX_LINK_HEADERS.findall(header):
        m = _REGEX_LINK_HEADER.match(entry)
        if not m:
            continue
        result: dict = {"target": m.group(1)}
        params = m.group(2) or ""
        for pm in _REGEX_LINK_HEADER_PARAMS.finditer(params):
            result[pm.group(1)] = (pm.group(2) if pm.group(2) is not None
                                   else pm.group(3))
        rel = result.get("rel", "")
        existing = rval.get(rel)
        if isinstance(existing, list):
            existing.append(result)
        elif rel in rval:
            rval[rel] = [existing, result]
        else:
            rval[rel] = result
    return rval


class _InFlight:
    __slots__ = ("event", "ok", "value")

    def __init__(self) -> None:
        self.event = threading.Event()
        self.ok = False
        self.value: Any = None


class RequestQueue:
    """Coalesces concurrent loads of the same URL (RequestQueue.js):
    while a URL is in flight, other callers wait on the same result
    instead of re-fetching. Like the reference, nothing is retained
    after the request completes (results ride on the per-request
    holder, not a growing map)."""

    def __init__(self) -> None:
        self._requests: dict[str, _InFlight] = {}
        self._lock = threading.Lock()
        self._loader: Callable[[str], Any] | None = None

    def wrap_loader(self, loader: Callable[[str], Any]):
        self._loader = loader
        return self.add

    def add(self, url: str):
        with self._lock:
            entry = self._requests.get(url)
            if entry is None:
                entry = _InFlight()
                self._requests[url] = entry
                owner = True
            else:
                owner = False
        if not owner:
            entry.event.wait()
            if entry.ok:
                return entry.value
            raise entry.value
        try:
            entry.value = self._loader(url)
            entry.ok = True
            return entry.value
        except Exception as exc:                     # noqa: BLE001
            entry.value = exc
            raise
        finally:
            with self._lock:
                del self._requests[url]
            entry.event.set()


def node_document_loader(transport: Transport, secure: bool = False,
                         max_redirects: int = -1,
                         headers: dict | None = None):
    """Build a loader with the reference node loader's full semantics,
    minus the socket (injected ``transport``). Returns
    ``loader(url) -> {contextUrl, documentUrl, document}``."""
    headers = build_headers(headers)
    if not any(h.lower() == "user-agent" for h in headers):
        headers = {**headers, "user-agent": "jsonld.js"}
    queue = RequestQueue()

    def load_document(url: str, redirects: list[str]):
        is_http = url.startswith("http:")
        is_https = url.startswith("https:")
        if not is_http and not is_https:
            raise JsonLdError(
                'URL could not be dereferenced; only "http" and "https" '
                'URLs are supported.', "jsonld.InvalidUrl",
                code="loading document failed", details={"url": url})
        if secure and not is_https:
            raise JsonLdError(
                "URL could not be dereferenced; secure mode is enabled "
                'and the URL\'s scheme is not "https".',
                "jsonld.InvalidUrl", code="loading document failed",
                details={"url": url})

        try:
            status, res_headers, body = transport(url, headers)
        except JsonLdError:
            raise
        except Exception as exc:                     # noqa: BLE001
            raise JsonLdError(
                "URL could not be dereferenced, an error occurred.",
                "jsonld.LoadDocumentError",
                code="loading document failed",
                details={"url": url, "cause": str(exc)})
        res_headers = {k.lower(): v for k, v in (res_headers or {}).items()}

        # `body || null` in the reference: falsy bodies (None, "") → None
        doc = {"contextUrl": None, "documentUrl": url,
               "document": body if body else None}
        if status >= 400:
            raise JsonLdError(
                f'URL "{url}" could not be dereferenced: '
                f"HTTP {status}", "jsonld.InvalidUrl",
                code="loading document failed",
                details={"url": url, "httpStatusCode": status})

        alternate = None
        link = res_headers.get("link")
        content_type = res_headers.get("content-type")
        if link and content_type != "application/ld+json":
            link_headers = parse_link_header(link)
            linked_context = link_headers.get(LINK_HEADER_CONTEXT)
            if isinstance(linked_context, list):
                raise JsonLdError(
                    "URL could not be dereferenced, it has more than one "
                    "associated HTTP Link Header.", "jsonld.InvalidUrl",
                    code="multiple context link headers",
                    details={"url": url})
            if linked_context:
                doc["contextUrl"] = linked_context["target"]
            # "alternate" link header is a redirect; duplicate alternate
            # headers parse to a list — the reference reads .type off
            # the array (undefined) and proceeds without setting a
            # location (node.js:113-120)
            alternate = link_headers.get("alternate")
            if isinstance(alternate, dict) and \
                    alternate.get("type") == "application/ld+json" \
                    and not re.match(r"^application/(\w*\+)?json$",
                                     content_type or ""):
                res_headers["location"] = prepend_base(
                    url, alternate["target"])

        location = res_headers.get("location")
        if (alternate or 300 <= status < 400) and location:
            if len(redirects) == max_redirects:
                raise JsonLdError(
                    "URL could not be dereferenced; there were too many "
                    "redirects.", "jsonld.TooManyRedirects",
                    code="loading document failed",
                    details={"url": url, "httpStatusCode": status,
                             "redirects": redirects})
            if url in redirects:
                raise JsonLdError(
                    "URL could not be dereferenced; infinite redirection "
                    "was detected.", "jsonld.InfiniteRedirectDetected",
                    code="recursive context inclusion",
                    details={"url": url, "httpStatusCode": status,
                             "redirects": redirects})
            redirects.append(url)
            return load_document(location, redirects)

        redirects.append(url)
        return doc

    return queue.wrap_loader(lambda url: load_document(url, []))
